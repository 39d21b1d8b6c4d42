"""Hash-exchange encode — the grouped pipeline without a sort.

``Dataset.groupby`` implements its exchange as a sample-based SORT
(sample → sort-map → sort-reduce): two barriers and a full ordered
rewrite of every block.  Our partitioner only needs EQUALITY
co-location (all rows of a pkey in one task) — order inside the
partition is re-established locally by the encoder's lexsort anyway.
This module implements the minimal exchange with raw Ray tasks (the
documented last-resort case: the Dataset API cannot express a
sort-free hash exchange in this version):

    map task  (one per input file-chunk): stream record batches into a
              bounded buffer (``SKAR_RAY_MAP_BUFFER_BYTES``, 128 MiB) →
              assign pkeys → hash-split into per-pkey sub-tables →
              ``ray.put`` each → return {pkey: [refs]} — worker heap is
              bounded by the buffer, not the input file size
    reduce    (one per pkey): ray.get(refs) → concat →
              ``encode_partition`` (unchanged)

Plasma traffic is one write + one read of the data — the sort path
pays that twice plus the sort compute.  Partitioning assumption: one
pkey's rows fit in one reduce task (guaranteed by the skew-aware plan's
salt cap).  Memory: the whole input transits the object store between
phases; Ray spills to disk if it exceeds the store (fine — that is the
store's job; at cluster scale the refs spread across nodes).

No global map→reduce barrier: a cheap metadata pre-pass records which
FILES contain which REPOS, so each pkey's set of contributing map
groups is known up front and its reduce launches the moment those
groups finish (``ray.wait`` loop) — map stragglers only delay their
own partitions, not the whole reduce phase.
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray

from ..stages import partitioner
from ..stages.encoder import encode_partition


def _map_buffer_bytes() -> int:
    """Heap bound for the map-side read buffer: batches accumulate to
    this many bytes, then split+put — a single giant input file streams
    through in bounded memory instead of materializing with to_table()."""
    return int(os.environ.get("SKAR_RAY_MAP_BUFFER_BYTES", 128 << 20))


@ray.remote
def _map_split(paths: list[str], plan: "partitioner.PartitionPlan",
               skip_pkeys: frozenset[int],
               buffer_bytes: int) -> dict[int, list["ray.ObjectRef"]]:
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    out: dict[int, list[ray.ObjectRef]] = {}

    def _split_put(t: pa.Table) -> None:
        keyed = partitioner.assign_pkeys(t, plan)
        # one sort + run slicing instead of a filter pass per pkey: the
        # old loop scanned the whole block once per DISTINCT pkey
        # (O(n·k) — k grows with partition count at scale); row order
        # within a pkey is irrelevant (the reducer lexsorts, and the
        # salt is content-derived so chunk boundaries don't move rows)
        idx = pc.sort_indices(keyed.column("pkey"))
        srt = keyed.take(idx).combine_chunks()
        pk = np.asarray(srt.column("pkey"), dtype=np.int64)
        if len(pk) == 0:
            return
        bounds = np.concatenate(([0], np.flatnonzero(np.diff(pk)) + 1, [len(pk)]))
        for i in range(len(bounds) - 1):
            start, end = int(bounds[i]), int(bounds[i + 1])
            pkey = int(pk[start])
            if pkey in skip_pkeys:
                continue
            ref = ray.put(srt.slice(start, end - start).combine_chunks())
            out.setdefault(pkey, []).append(ref)

    # stream record batches with a bounded accumulation buffer: peak
    # worker heap is ~buffer + its sorted copy, independent of file size
    buf: list[pa.Table] = []
    buf_bytes = 0
    for p in paths:
        for b in pads.dataset(p).to_batches():
            if b.num_rows == 0:
                continue
            buf.append(pa.Table.from_batches([b]))
            buf_bytes += b.nbytes
            if buf_bytes >= buffer_bytes:
                _split_put(pa.concat_tables(buf) if len(buf) > 1 else buf[0])
                buf, buf_bytes = [], 0
    if buf:
        _split_put(pa.concat_tables(buf) if len(buf) > 1 else buf[0])
    return out


@ray.remote
def _reduce_encode(pkey: int, refs: list["ray.ObjectRef"], out_dir: str,
                   chunk_target_bytes: int, input_fingerprint: str,
                   codec_overrides: dict | None, validate: bool = True) -> dict:
    tables = ray.get(list(refs))
    t = pa.concat_tables(tables).combine_chunks() if len(tables) > 1 else tables[0]
    summary = encode_partition(t, out_dir, chunk_target_bytes, input_fingerprint,
                               codec_overrides, validate=validate)
    return {k: summary.column(k)[0].as_py() for k in summary.column_names}


def file_repo_sets(paths: list[str]) -> dict[str, list[str]]:
    """Per-file unique repo sets, with a persistent sidecar cache keyed
    on (path, size, mtime_ns).  Shared by the per-pkey fingerprint pass
    (``encode_job._pkey_fingerprints``) and the map-group metadata
    pre-pass here, so each file's repo column is read AT MOST ONCE per
    content version — not once per pass per run.  Misses are read in
    parallel Ray tasks (tiny, dictionary-encoded column only)."""
    import hashlib
    import json

    cache_dir = "/tmp/skar_ray_plans/file_repos"
    os.makedirs(cache_dir, exist_ok=True)
    out: dict[str, list[str]] = {}
    misses: list[tuple[str, str]] = []
    for p in paths:
        st = os.stat(p)
        key = hashlib.sha256(
            f"{p}:{st.st_size}:{st.st_mtime_ns}".encode()
        ).hexdigest()[:24]
        cf = os.path.join(cache_dir, key + ".json")
        if os.path.exists(cf):
            with open(cf) as f:
                out[p] = json.load(f)
        else:
            misses.append((p, cf))

    if misses:
        @ray.remote
        def _repos_of_file(path: str) -> list[str]:
            import pyarrow.compute as pc
            import pyarrow.dataset as pads

            t = pads.dataset(path).to_table(columns=["repo"])
            return sorted(set(pc.unique(t.column("repo")).to_pylist()))

        got = ray.get([_repos_of_file.remote(p) for p, _ in misses])
        for (p, cf), repos in zip(misses, got):
            out[p] = repos
            tmp = cf + f".tmp-{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(repos, f)
            os.replace(tmp, cf)
    return out


def run_hashed_encode(
    corpus_path: str,
    out_dir: str,
    plan: "partitioner.PartitionPlan",
    chunk_target_bytes: int,
    input_fingerprint: "str | dict[int, str]",
    skip_pkeys: frozenset[int] = frozenset(),
    codec_overrides: dict | None = None,
    files_per_map: int | None = None,
    validate: bool = True,
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

    # launch the heavy maps FIRST; the metadata pre-pass overlaps them
    buffer_bytes = _map_buffer_bytes()
    map_futs = {(_map_split.remote(g, plan, skip_pkeys, buffer_bytes)): gi
                for gi, g in enumerate(groups)}
    # metadata pre-pass: which repos live in which map group → pkey →
    # contributing groups.  Served from the per-file sidecar cache that
    # encode_job's fingerprint pass already populated — a warm run
    # reads zero repo columns here
    repo_sets = file_repo_sets(paths)
    group_repos = [sorted(set().union(*(repo_sets[p] for p in g))) for g in groups]
    contrib: dict[int, set[int]] = {}
    for gi, repos in enumerate(group_repos):
        for r in repos:
            s, nb = plan.repos.get(r, (0, 1))  # mirror assign_pkeys' default
            for pk in range(s, s + nb):
                if pk not in skip_pkeys:
                    contrib.setdefault(pk, set()).add(gi)

    def _fp(pk: int) -> str:
        # ship only THIS pkey's fingerprint string into its reduce task:
        # pickling the whole per-partition dict into every call would be
        # O(P²) bytes across the reduce wave at scale
        return (input_fingerprint.get(pk, "")
                if isinstance(input_fingerprint, dict) else input_fingerprint)

    # ray.wait-driven: launch each pkey's reduce the moment every map
    # group that can contribute to it has finished
    done_maps: dict[int, dict[int, "ray.ObjectRef"]] = {}
    launched: set[int] = set()
    futs = []

    def _launch_ready():
        done_set = set(done_maps)
        for pk, needed in contrib.items():
            if pk in launched or not needed <= done_set:
                continue
            refs = [r for gi in sorted(needed) if pk in done_maps[gi]
                    for r in done_maps[gi][pk]]
            if refs:
                futs.append(_reduce_encode.remote(
                    pk, refs, out_dir, chunk_target_bytes, _fp(pk), codec_overrides,
                    validate,
                ))
            launched.add(pk)

    pending = dict(map_futs)
    while pending:
        ready, _ = ray.wait(list(pending.keys()), num_returns=1)
        for fut in ready:
            done_maps[pending.pop(fut)] = ray.get(fut)
        _launch_ready()
    # defensive: any pkey emitted by a map but missed by the metadata
    # pre-pass (cannot happen when repo sets are exact) still encodes
    leftovers: dict[int, list] = {}
    for gi, d in done_maps.items():
        for pk, refs in d.items():
            if pk not in launched:
                leftovers.setdefault(pk, []).extend(refs)
    for pk, refs in sorted(leftovers.items()):
        futs.append(_reduce_encode.remote(
            pk, refs, out_dir, chunk_target_bytes, _fp(pk), codec_overrides,
            validate,
        ))
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
