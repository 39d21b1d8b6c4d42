"""Query engine over ENCODED partitions — skar's query path, Ray-first.

The reference serves filter/project queries directly over its
compressed folders: iterate folder index → prune folders via per-folder
indexes → read only selected columns of selected row groups → apply
DNF selections → project (/root/reference/skar/src/query/handler.rs:
96-185, execution/mod.rs:21-65).  Ours:

    manifests → partition pruning (min/max + distinct sets from the
    manifest, §2.4 bloom-prelookup analog) → DecoderActor pool reading
    ONLY the needed columns from each .skarc → vectorised DNF filter
    (`pyarrow.compute`) → projection → optional limit.

Filter language (DNF, mirroring skar's OR-of-selections / AND-within,
net-types/src/lib.rs:13-54): ``[[(col, op, value), ...], ...]`` —
outer list OR, inner list AND; ops: ``== != in >= > <= < prefix``.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..stages.decoder import DecoderActor
from ..state import manifest as manifest_mod

Clause = tuple[str, str, Any]
DNF = list[list[Clause]]


def prune_partitions(manifests: dict[int, manifest_mod.PartitionManifest], dnf: DNF | None) -> list[int]:
    """Partition ids that may contain matches (skar's prune_query,
    handler.rs:187-250: a folder is skipped only when EVERY selection
    is impossible)."""
    from ..state.pruning import dnf_possible

    if not dnf:
        return sorted(manifests)
    keep = []
    for pid, m in sorted(manifests.items()):
        stats = (m.extra or {}).get("stats", {})
        if dnf_possible(lambda c: stats.get(c), dnf):
            keep.append(pid)
    return keep


def _apply_dnf(t: pa.Table, dnf: DNF) -> pa.Table:
    masks = []
    for conj in dnf:
        m = None
        for col, op, value in conj:
            a = t.column(col)
            if op == "==":
                cm = pc.equal(a, value)
            elif op == "!=":
                cm = pc.not_equal(a, value)
            elif op == "in":
                cm = pc.is_in(a, value_set=pa.array(sorted(value)))
            elif op == ">=":
                cm = pc.greater_equal(a, value)
            elif op == ">":
                cm = pc.greater(a, value)
            elif op == "<=":
                cm = pc.less_equal(a, value)
            elif op == "<":
                cm = pc.less(a, value)
            elif op == "prefix":
                cm = pc.starts_with(a, pattern=value)
            else:
                raise ValueError(f"unknown op {op}")
            m = cm if m is None else pc.and_kleene(m, cm)
        masks.append(m)
    mask = masks[0]
    for m in masks[1:]:
        mask = pc.or_kleene(mask, m)
    return t.filter(mask)


def query_encoded(
    out_dir: str,
    columns: list[str] | None = None,
    filters: DNF | None = None,
    limit: int | None = None,
    concurrency=None,
) -> "ray.data.Dataset":
    """Projected, filtered, pruned read over encoded partitions."""
    if concurrency is None:
        from .decode_job import _pool_size

        concurrency = _pool_size()
    manifests = manifest_mod.scan_manifests(out_dir)
    pids = prune_partitions(manifests, filters)
    # §2.10 encoded-form fast path: a single equality/IN clause on one
    # column is evaluated on the dict/rle CODE stream inside the
    # container — the filter column itself is never materialized
    encoded_filter = None
    residual_filters = filters
    if filters and len(filters) == 1 and len(filters[0]) == 1:
        col, op, value = filters[0][0]
        if op in ("==", "in"):
            encoded_filter = (col, list(value) if op == "in" else [value])
            residual_filters = None
    filter_cols = sorted({c for conj in (residual_filters or []) for c, _, _ in conj})
    read_cols = sorted(set(columns or []) | set(filter_cols)) if columns else None
    rows = [
        {
            "partition_id": pid,
            "data_file": manifests[pid].data_file,
            "n_rows": manifests[pid].n_rows,
            "content_sha256": manifests[pid].content_sha256,
        }
        for pid in pids
    ]
    mds = ray.data.from_items(rows)
    ds = mds.map_batches(
        DecoderActor,
        fn_constructor_kwargs=dict(
            out_dir=out_dir, columns=read_cols, verify=False, dnf=filters,
            encoded_filter=encoded_filter,
        ),
        batch_format="pyarrow",
        batch_size=1,
        concurrency=concurrency,
    )
    if residual_filters:
        ds = ds.map_batches(lambda t: _apply_dnf(t, residual_filters), batch_format="pyarrow")
    if columns:
        ds = ds.map_batches(lambda t: t.select(columns), batch_format="pyarrow")
    if limit is not None:
        ds = ds.limit(limit)
    return ds
