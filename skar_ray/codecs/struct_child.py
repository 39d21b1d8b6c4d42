"""Struct codec — per-field child compression.

``struct<primitive...>`` columns decompose into one stream per field,
each run through the full auto-selection (dict/rle/FoR/delta/fsst/
bytesplit...), plus an outer validity bitmap.  This is exactly how the
reference lays out its nested access-list / log-topic data as flat
sibling columns (/root/reference/skar/src/schema.rs:119-349) — the
struct type just keeps the grouping intact through the engine.
Nested structs/lists inside fields recurse through the same registry
(list_child / struct_child are themselves candidates).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import base


class StructChildCodec:
    name = "struct_child"

    def can_encode(self, t: pa.DataType) -> bool:
        if not pa.types.is_struct(t):
            return False
        return all(
            base.is_string_like(f.type) or base.is_numeric(f.type)
            or base.is_numeric_list(f.type) or pa.types.is_struct(f.type)
            for f in t
        )

    def encode(self, arr: pa.Array) -> tuple[bytes, dict]:
        from . import auto

        mask = np.asarray(arr.is_valid())
        nulls = np.packbits(mask).tobytes() if arr.null_count else b""
        field_metas = []
        payloads = []
        for i, f in enumerate(arr.type):
            child = arr.field(i)
            codec, _est = auto.select_codec(child)
            payload, meta = base.encode_array(child, codec)
            field_metas.append({"name": f.name, "meta": meta})
            payloads.append(payload)
        meta = {"has_nulls": bool(arr.null_count), "fields": field_metas}
        return base.pack_sections(nulls, *payloads), meta

    def decode(self, payload: bytes, meta: dict, n: int) -> pa.Array:
        sections = base.unpack_sections(payload)
        nulls_b, payloads = sections[0], sections[1:]
        children = [base.decode_array(p, fm["meta"]) for p, fm in zip(payloads, meta["fields"])]
        names = [fm["name"] for fm in meta["fields"]]
        mask = None
        if meta.get("has_nulls"):
            valid = np.unpackbits(np.frombuffer(nulls_b, dtype=np.uint8), count=n).astype(bool)
            mask = pa.array(~valid)
        return pa.StructArray.from_arrays(children, names, mask=mask)


base.register(StructChildCodec())
