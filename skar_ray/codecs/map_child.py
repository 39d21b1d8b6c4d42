"""Map codec — entry-list decomposition with child-level compression.

``map<k, v>`` is physically list<struct<key, value>>: per-row entry
counts (FoR-bitpacked) plus flat key and value streams, each through
the full auto-selection (keys are typically low-cardinality strings →
dict/rle; values route by their own type).  Completes the nested-type
story next to list_child / struct_child.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import base
from .for_bitpack import pack_ints_with_reference, unpack_ints_with_reference


class MapChildCodec:
    name = "map_child"

    def can_encode(self, t: pa.DataType) -> bool:
        return pa.types.is_map(t) and (
            base.is_string_like(t.key_type) or base.is_numeric(t.key_type)
        ) and (
            base.is_string_like(t.item_type) or base.is_numeric(t.item_type)
        )

    def encode(self, arr: pa.Array) -> tuple[bytes, dict]:
        from . import auto

        mask = np.asarray(arr.is_valid())
        nulls = np.packbits(mask).tobytes() if arr.null_count else b""
        offsets = np.asarray(arr.offsets, dtype=np.int64)
        lengths = np.diff(offsets)
        # arr.keys / arr.items return the FULL child arrays even for a
        # sliced MapArray, while arr.offsets is the slice's window of
        # ABSOLUTE child positions — select exactly the window's entries
        # or a Ray block split would silently encode the wrong rows'
        # key/value pairs
        keys = arr.keys
        items = arr.items
        if arr.null_count:
            # keep only valid rows' entries (null slots may span garbage);
            # starts/ends are absolute child indices, so taking from the
            # full child is slice-correct by construction
            lengths = np.where(mask, lengths, 0)
            starts, ends = offsets[:-1][mask], offsets[1:][mask]
            sel = pa.array(
                np.concatenate([np.arange(s, e) for s, e in zip(starts, ends)])
                if len(starts) else np.array([], dtype=np.int64)
            )
            keys = keys.take(sel)
            items = items.take(sel)
        elif len(offsets):
            start, end = int(offsets[0]), int(offsets[-1])
            if start != 0 or end != len(keys):
                keys = keys.slice(start, end - start)
                items = items.slice(start, end - start)
        lens_payload, lens_meta = pack_ints_with_reference(lengths)
        k_codec, _ = auto.select_codec(keys)
        v_codec, _ = auto.select_codec(items)
        k_payload, k_meta = base.encode_array(keys, k_codec)
        v_payload, v_meta = base.encode_array(items, v_codec)
        meta = {
            "has_nulls": bool(arr.null_count),
            "lens_meta": lens_meta,
            "key_meta": k_meta,
            "item_meta": v_meta,
        }
        return base.pack_sections(nulls, lens_payload, k_payload, v_payload), meta

    def decode(self, payload: bytes, meta: dict, n: int) -> pa.Array:
        t = base.type_from_name(meta["type"])
        nulls_b, lens_payload, k_payload, v_payload = base.unpack_sections(payload)
        lengths = unpack_ints_with_reference(lens_payload, meta["lens_meta"], n)
        keys = base.decode_array(k_payload, meta["key_meta"])
        items = base.decode_array(v_payload, meta["item_meta"])
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        off32 = pa.array(offsets.astype(np.int32), type=pa.int32())
        if keys.type != t.key_type:
            keys = keys.cast(t.key_type)
        if items.type != t.item_type:
            items = items.cast(t.item_type)
        m = pa.MapArray.from_arrays(off32, keys, items)
        if meta.get("has_nulls"):
            valid = np.unpackbits(np.frombuffer(nulls_b, dtype=np.uint8), count=n).astype(bool)
            # MapArray.from_arrays lacks a mask argument: rebuild with a
            # validity bitmap at the buffer level
            validity = pa.py_buffer(np.packbits(valid, bitorder="little").tobytes())
            m = pa.Array.from_buffers(
                m.type, n, [validity, m.buffers()[1]], children=[m.values]
            )
        return m


base.register(MapChildCodec())
