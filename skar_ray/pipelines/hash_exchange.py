"""Hash-exchange encode — the grouped pipeline without a sort.

``Dataset.groupby`` implements its exchange as a sample-based SORT
(sample → sort-map → sort-reduce): two barriers and a full ordered
rewrite of every block.  Our partitioner only needs EQUALITY
co-location (all rows of a pkey in one task) — order inside the
partition is re-established locally by the encoder's lexsort anyway.
This module implements the minimal exchange with raw Ray tasks (the
documented last-resort case: the Dataset API cannot express a
sort-free hash exchange in this version):

    map task  (one per input file-chunk): read → assign pkeys →
              hash-split into per-pkey sub-tables → ``ray.put`` each →
              return {pkey: ref}
    reduce    (one per pkey): ray.get(refs) → concat →
              ``encode_partition`` (unchanged)

Plasma traffic is one write + one read of the data — the sort path
pays that twice plus the sort compute.  Partitioning assumption: one
pkey's rows fit in one reduce task (guaranteed by the skew-aware plan's
salt cap).  Memory: the whole input transits the object store between
phases; Ray spills to disk if it exceeds the store (fine — that is the
store's job; at cluster scale the refs spread across nodes).
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray

from ..stages import partitioner
from ..stages.encoder import encode_partition


@ray.remote
def _map_split(paths: list[str], plan: "partitioner.PartitionPlan",
               skip_pkeys: frozenset[int]) -> dict[int, "ray.ObjectRef"]:
    import pyarrow.dataset as pads

    tables = []
    for p in paths:
        tables.append(pads.dataset(p).to_table())
    t = pa.concat_tables(tables) if len(tables) > 1 else tables[0]
    keyed = partitioner.assign_pkeys(t, plan)
    pkeys = keyed.column("pkey")
    import pyarrow.compute as pc

    out: dict[int, ray.ObjectRef] = {}
    for pk in pc.unique(pkeys).to_pylist():
        if pk in skip_pkeys:
            continue
        sub = keyed.filter(pc.equal(pkeys, pk))
        out[int(pk)] = ray.put(sub.combine_chunks())
    return out


@ray.remote
def _reduce_encode(pkey: int, refs: list["ray.ObjectRef"], out_dir: str,
                   chunk_target_bytes: int, input_fingerprint: str,
                   codec_overrides: dict | None) -> dict:
    tables = ray.get(list(refs))
    t = pa.concat_tables(tables).combine_chunks() if len(tables) > 1 else tables[0]
    summary = encode_partition(t, out_dir, chunk_target_bytes, input_fingerprint, codec_overrides)
    return {k: summary.column(k)[0].as_py() for k in summary.column_names}


def run_hashed_encode(
    corpus_path: str,
    out_dir: str,
    plan: "partitioner.PartitionPlan",
    chunk_target_bytes: int,
    input_fingerprint: str,
    skip_pkeys: frozenset[int] = frozenset(),
    codec_overrides: dict | None = None,
    files_per_map: int | None = None,
) -> pa.Table:
    paths = (
        [os.path.join(corpus_path, f) for f in sorted(os.listdir(corpus_path)) if f.endswith(".parquet")]
        if os.path.isdir(corpus_path)
        else [corpus_path]
    )
    if files_per_map is None:
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        files_per_map = max(1, len(paths) // (2 * ncpu) or 1)
    groups = [paths[i : i + files_per_map] for i in range(0, len(paths), files_per_map)]
    map_out = ray.get([_map_split.remote(g, plan, skip_pkeys) for g in groups])
    by_pkey: dict[int, list] = {}
    for d in map_out:
        for pk, ref in d.items():
            by_pkey.setdefault(pk, []).append(ref)
    futs = [
        _reduce_encode.remote(pk, refs, out_dir, chunk_target_bytes, input_fingerprint, codec_overrides)
        for pk, refs in sorted(by_pkey.items())
    ]
    rows = ray.get(futs)
    if not rows:
        return pa.table(
            {
                "partition_id": pa.array([], type=pa.int64()),
                "n_rows": pa.array([], type=pa.int64()),
                "raw_bytes": pa.array([], type=pa.int64()),
                "enc_bytes": pa.array([], type=pa.int64()),
                "content_sha256": pa.array([], type=pa.string()),
                "skipped": pa.array([], type=pa.bool_()),
            }
        )
    import pandas as pd

    return pa.Table.from_pandas(pd.DataFrame(rows))
