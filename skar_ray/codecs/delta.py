"""Delta codec — consecutive differences + FoR bit-packing.

The classic lightweight scheme for monotonic / smooth integer columns
(row ids, timestamps, cumulative offsets): ``x[0], diff(x)`` rebased
and bit-packed.  Complements ``for_bitpack`` (which wins on tight
*ranges*; delta wins on tight *steps* over a wide range — e.g. an
event_id sequence spanning 2^40 but stepping by ~1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import base
from .for_bitpack import pack_ints_with_reference, unpack_ints_with_reference


class DeltaCodec:
    name = "delta"

    def can_encode(self, t: pa.DataType) -> bool:
        return base.is_int_like(t)

    def encode(self, arr: pa.Array) -> tuple[bytes, dict]:
        nulls, filled = base.split_nulls(arr)
        vals = base.ints_to_numpy(filled)
        if pa.types.is_timestamp(arr.type):
            vals = vals.view(np.int64)
        vals = vals.astype(np.int64)
        if len(vals):
            first = int(vals[0])
            deltas = np.diff(vals)
        else:
            first = 0
            deltas = np.zeros(0, dtype=np.int64)
        payload, meta = pack_ints_with_reference(deltas)
        meta["first"] = first
        meta["has_nulls"] = nulls is not None
        return base.pack_sections(nulls or b"", payload), meta

    def decode(self, payload: bytes, meta: dict, n: int) -> pa.Array:
        t = base.type_from_name(meta["type"])
        nulls_b, body = base.unpack_sections(payload)
        if n == 0:
            vals = np.zeros(0, dtype=np.int64)
        else:
            deltas = unpack_ints_with_reference(body, meta, n - 1)
            vals = np.empty(n, dtype=np.int64)
            vals[0] = meta["first"]
            np.cumsum(deltas, out=vals[1:])
            vals[1:] += meta["first"]
        if pa.types.is_timestamp(t):
            arr = pa.array(vals, type=pa.int64()).cast(t)
        else:
            arr = pa.array(vals.astype(np.dtype(str(t))), type=t)
        return base.apply_nulls(arr, nulls_b if meta.get("has_nulls") else None, n)


base.register(DeltaCodec())
