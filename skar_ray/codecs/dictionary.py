"""Dictionary codec — low-cardinality columns (repo, lang, commit).

``pyarrow.compute.dictionary_encode`` produces (indices, values); the
indices are FoR+bit-packed and the distinct values are plain-encoded.
The analog of Parquet dictionary encoding, implemented as our own
composition so the auto-selector can weigh it against RLE/FSST.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import base
from .for_bitpack import bitpack, bitunpack
from .plain import PlainCodec

_plain = PlainCodec()


def dict_encode_to_parts(filled: pa.Array) -> tuple[np.ndarray, pa.Array]:
    """Return (int64 indices, distinct values array) for a null-free array."""
    denc = pc.dictionary_encode(filled)
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    indices = np.asarray(denc.indices)
    values = denc.dictionary
    return indices.astype(np.int64), values


class DictionaryCodec:
    name = "dict"

    def can_encode(self, t: pa.DataType) -> bool:
        return base.is_string_like(t) or base.is_numeric(t)

    def encode(self, arr: pa.Array) -> tuple[bytes, dict]:
        nulls, filled = base.split_nulls(arr)
        indices, values = dict_encode_to_parts(filled)
        idx_payload, width, _ = bitpack(indices.astype(np.uint64))
        val_payload, val_meta = _plain.encode(values)
        val_meta["type"] = base.type_name(values.type)
        val_meta["n"] = len(values)
        meta = {
            "width": width,
            "card": len(values),
            "values_meta": val_meta,
            "has_nulls": nulls is not None,
        }
        return base.pack_sections(nulls or b"", idx_payload, val_payload), meta

    def decode(self, payload: bytes, meta: dict, n: int) -> pa.Array:
        t = base.type_from_name(meta["type"])
        nulls_b, idx_payload, val_payload = base.unpack_sections(payload)
        indices = bitunpack(idx_payload, meta["width"], n).astype(np.int64)
        vm = meta["values_meta"]
        values = _plain.decode(val_payload, vm, vm["n"])
        arr = values.take(pa.array(indices))
        if arr.type != t:
            arr = arr.cast(t)
        return base.apply_nulls(arr, nulls_b if meta.get("has_nulls") else None, n)


base.register(DictionaryCodec())
