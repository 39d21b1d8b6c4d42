"""Frame-of-reference + bit-packing for integer-like columns.

Values are rebased to ``min`` and packed at the minimal bit width —
the classic lightweight scheme for derived integer columns
(``content_len``, dict/RLE indices, run lengths).  Fully vectorised:
the bit matrix is built with numpy shifts and ``np.packbits``.

Floats are bit-packed only when they are exactly representable small
integers; otherwise the auto-selector falls back to plain.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import base


def bitpack(vals: np.ndarray) -> tuple[bytes, int, int]:
    """Pack non-negative uint64 values; returns (payload, width, n)."""
    vals = vals.astype(np.uint64, copy=False)
    maxv = int(vals.max()) if len(vals) else 0
    width = max(1, maxv.bit_length())
    if width > 32:
        # not worth a bit matrix at this width; store raw 8-byte
        return vals.tobytes(), 64, len(vals)
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((vals[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.reshape(-1)).tobytes(), width, len(vals)


def bitunpack(payload: bytes, width: int, n: int) -> np.ndarray:
    if width == 64:
        return np.frombuffer(payload, dtype=np.uint64, count=n)
    bits = np.unpackbits(np.frombuffer(payload, dtype=np.uint8), count=n * width)
    bits = bits.reshape(n, width).astype(np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    return (bits << shifts).sum(axis=1, dtype=np.uint64)


def pack_ints_with_reference(vals: np.ndarray) -> tuple[bytes, dict]:
    """FoR-rebase a signed/unsigned integer array and bit-pack it."""
    base_val = int(vals.min()) if len(vals) else 0
    rebased = (vals.astype(np.int64) - base_val).astype(np.uint64)
    payload, width, _ = bitpack(rebased)
    return payload, {"ref": base_val, "width": width}


def unpack_ints_with_reference(payload: bytes, meta: dict, n: int) -> np.ndarray:
    vals = bitunpack(payload, meta["width"], n).astype(np.int64)
    return vals + meta["ref"]


class ForBitpackCodec:
    name = "for_bitpack"

    def can_encode(self, t: pa.DataType) -> bool:
        return base.is_int_like(t) or pa.types.is_boolean(t)

    def encode(self, arr: pa.Array) -> tuple[bytes, dict]:
        nulls, filled = base.split_nulls(arr)
        vals = base.ints_to_numpy(filled)
        if pa.types.is_boolean(arr.type):
            vals = vals.astype(np.uint8)
        if pa.types.is_timestamp(arr.type):
            vals = vals.view(np.int64)
        if vals.dtype == np.uint64 and len(vals) and int(vals.max()) > np.iinfo(np.int64).max:
            raise ValueError("uint64 overflow range; use plain")
        payload, meta = pack_ints_with_reference(vals)
        meta["has_nulls"] = nulls is not None
        return base.pack_sections(nulls or b"", payload), meta

    def decode(self, payload: bytes, meta: dict, n: int) -> pa.Array:
        t = base.type_from_name(meta["type"])
        nulls_b, body = base.unpack_sections(payload)
        vals = unpack_ints_with_reference(body, meta, n)
        if pa.types.is_boolean(t):
            arr = pa.array(vals.astype(bool), type=t)
        elif pa.types.is_timestamp(t):
            arr = pa.array(vals, type=pa.int64()).cast(t)
        else:
            arr = pa.array(vals.astype(np.dtype(str(t))) if not pa.types.is_timestamp(t) else vals, type=t)
        return base.apply_nulls(arr, nulls_b if meta.get("has_nulls") else None, n)


base.register(ForBitpackCodec())
