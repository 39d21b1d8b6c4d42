"""Ingest validation — skar validates EVERY batch before it enters the
write path (receipt↔tx bijection, logs_bloom recompute, block
contiguity: /root/reference/ingest/src/validate.rs:8-71).  Our analog:

- ``validate_schema``: the corpus table must match the declared shape
  exactly (names, types, no surprise columns) — fail fast at job start,
  not deep inside an encode task;
- ``validate_batch``: per-batch invariants as a pass-through
  ``map_batches`` stage (valid UTF-8 is guaranteed by Arrow's string
  type; we check null policy and non-negative lengths).
"""

from __future__ import annotations

import pyarrow as pa

CORPUS_SCHEMA = {
    "repo": (pa.string(),),
    "path": (pa.string(),),
    "commit": (pa.string(),),
    "lang": (pa.string(),),
    "content": (pa.large_string(), pa.string()),
}


def validate_schema(schema: pa.Schema, required: dict = CORPUS_SCHEMA) -> None:
    """Corpus-shaped inputs must match the declared column types; any
    other table (the engine is generic) must at least be fully
    encodable — unsupported column types fail here, not mid-task."""
    from ..codecs import base

    names = set(schema.names)
    if set(required) <= names:
        for name, allowed in required.items():
            t = schema.field(name).type
            if t not in allowed:
                raise ValueError(f"column {name!r} has type {t}, expected one of {allowed}")
        return
    for field in schema:
        t = field.type
        from ..codecs.map_child import MapChildCodec
        from ..codecs.struct_child import StructChildCodec

        if not (base.is_string_like(t) or base.is_numeric(t) or base.is_numeric_list(t)
                or StructChildCodec().can_encode(t) or MapChildCodec().can_encode(t)):
            raise ValueError(f"column {field.name!r}: unsupported type {t} (no codec)")


def validate_batch(batch: pa.Table, allow_null_content: bool = False) -> pa.Table:
    """Pass-through invariant check for a map_batches stage."""
    if not allow_null_content and "content" in batch.column_names:
        nulls = batch.column("content").null_count
        if nulls:
            raise ValueError(f"{nulls} null content rows (nulls disallowed by policy)")
    return batch
