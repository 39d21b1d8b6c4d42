"""Byte-stream-split codec for numeric columns.

The BYTE_STREAM_SPLIT idea (Parquet's encoding for float data): store
byte k of every value contiguously, so the page zstd pass sees long
runs of structurally-similar bytes (exponents together, low mantissa
bytes together).  The transform itself is size-neutral; the win comes
entirely from the page codec — which is why the auto-selector's
estimate (post-zstd bytes) is the right arbiter.  Replaces the
reference's Plain-and-let-zstd-cope path
(/root/reference/skar/src/write_parquet.rs:49-53) for float-heavy
columns, most importantly flattened embedding values.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import base


class ByteSplitCodec:
    name = "bytesplit"

    def can_encode(self, t: pa.DataType) -> bool:
        return base.is_numeric(t) and not pa.types.is_boolean(t)

    def encode(self, arr: pa.Array) -> tuple[bytes, dict]:
        nulls, filled = base.split_nulls(arr)
        vals = base.ints_to_numpy(filled)
        if pa.types.is_timestamp(arr.type):
            vals = vals.view(np.int64)
        vals = np.ascontiguousarray(vals)
        n = len(vals)
        w = vals.dtype.itemsize
        planes = vals.view(np.uint8).reshape(n, w).T.copy() if n else np.zeros((w, 0), np.uint8)
        meta = {"dtype": vals.dtype.str, "has_nulls": nulls is not None}
        return base.pack_sections(nulls or b"", planes.tobytes()), meta

    def decode(self, payload: bytes, meta: dict, n: int) -> pa.Array:
        t = base.type_from_name(meta["type"])
        nulls_b, body = base.unpack_sections(payload)
        dt = np.dtype(meta["dtype"])
        planes = np.frombuffer(body, dtype=np.uint8).reshape(dt.itemsize, n)
        vals = np.ascontiguousarray(planes.T).view(dt).reshape(n)
        if pa.types.is_timestamp(t):
            arr = pa.array(vals.view(np.int64), type=pa.int64()).cast(t)
        else:
            arr = pa.array(vals, type=t)
        return base.apply_nulls(arr, nulls_b if meta.get("has_nulls") else None, n)


base.register(ByteSplitCodec())
