"""Plain codec — raw buffers, the universal fallback.

Mirrors the reference's ``Encoding::Plain`` column path
(/root/reference/skar/src/write_parquet.rs:49-53): no lightweight
transform, leaving all compression to the container's zstd page pass.
Every Arrow type the engine supports round-trips through here.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import base


class PlainCodec:
    name = "plain"

    def can_encode(self, t: pa.DataType) -> bool:
        return base.is_string_like(t) or base.is_numeric(t) or base.is_numeric_list(t)

    def encode(self, arr: pa.Array) -> tuple[bytes, dict]:
        if base.is_numeric_list(arr.type):
            return self._encode_list(arr)
        nulls, filled = base.split_nulls(arr)
        meta: dict = {}
        if base.is_string_like(arr.type):
            lengths, data = base.strings_to_buffers(filled)
            payload = base.pack_sections(
                nulls or b"", lengths.astype(np.int64).tobytes(), data
            )
        elif pa.types.is_boolean(arr.type):
            bits = np.packbits(base.ints_to_numpy(filled).astype(bool))
            payload = base.pack_sections(nulls or b"", bits.tobytes())
        else:
            vals = base.ints_to_numpy(filled)
            payload = base.pack_sections(nulls or b"", vals.tobytes())
            meta["dtype"] = vals.dtype.str
        meta["has_nulls"] = nulls is not None
        return payload, meta

    def _encode_list(self, arr: pa.Array) -> tuple[bytes, dict]:
        """list<numeric> (embedding columns): lengths + flattened child
        values; null lists carried as a validity bitmap."""
        import pyarrow.compute as pc

        mask = np.asarray(arr.is_valid())
        nulls = np.packbits(mask).tobytes() if arr.null_count else b""
        lengths = np.asarray(pc.list_value_length(arr).fill_null(0)).astype(np.int64)
        child = arr.flatten()  # respects offsets/nulls: only valid lists' values
        if child.null_count:
            raise ValueError("null elements inside lists are not supported")
        vals = child.to_numpy(zero_copy_only=False)
        meta = {
            "list": True,
            "has_nulls": bool(arr.null_count),
            "child_dtype": vals.dtype.str,
        }
        payload = base.pack_sections(nulls, lengths.tobytes(), vals.tobytes())
        return payload, meta

    def _decode_list(self, payload: bytes, meta: dict, n: int) -> pa.Array:
        t = base.type_from_name(meta["type"])
        nulls_b, lengths_b, vals_b = base.unpack_sections(payload)
        lengths = np.frombuffer(lengths_b, dtype=np.int64)
        vals = np.frombuffer(vals_b, dtype=np.dtype(meta["child_dtype"]))
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        child = pa.array(vals, type=t.value_type)
        mask = None
        if meta.get("has_nulls"):
            valid = np.unpackbits(np.frombuffer(nulls_b, dtype=np.uint8), count=n).astype(bool)
            mask = pa.array(~valid)
        if pa.types.is_large_list(t):
            return pa.LargeListArray.from_arrays(
                pa.array(offsets, type=pa.int64()), child, mask=mask
            )
        return pa.ListArray.from_arrays(
            pa.array(offsets.astype(np.int32), type=pa.int32()), child, mask=mask
        )

    def decode(self, payload: bytes, meta: dict, n: int) -> pa.Array:
        if meta.get("list"):
            return self._decode_list(payload, meta, n)
        t = base.type_from_name(meta["type"])
        sections = base.unpack_sections(payload)
        nulls = sections[0] if meta.get("has_nulls") else None
        if base.is_string_like(t):
            lengths = np.frombuffer(sections[1], dtype=np.int64)
            arr = base.strings_from_buffers(lengths, sections[2], t)
        elif pa.types.is_boolean(t):
            bits = np.unpackbits(np.frombuffer(sections[1], dtype=np.uint8), count=n).astype(bool)
            arr = pa.array(bits, type=t)
        else:
            vals = np.frombuffer(sections[1], dtype=np.dtype(meta["dtype"]))
            if pa.types.is_timestamp(t):
                arr = pa.array(vals.view(np.int64), type=pa.int64()).cast(t)
            else:
                arr = pa.array(vals, type=t)
        return base.apply_nulls(arr, nulls, n)


base.register(PlainCodec())
