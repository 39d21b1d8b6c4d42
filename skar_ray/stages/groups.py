"""Shared two-level group exchange.

``Dataset.groupby(fine_key).map_groups(fn)`` pays per-group task and
DataFrame overhead — LSH banding, (user, time-bucket) windows and
similar stages produce millions of mostly-singleton groups, where that
overhead dominates wall time (measured 4.1 s of a 10 s dedup pipeline).
``bucketed_group_apply`` shuffles ONCE on a coarse hash of the fine
key and applies ``fn`` per fine group with a LOCAL vectorised pandas
groupby — identical results, same rows moved, constant task count.

Two backends, equality-tested (mirroring the encode path's grouped vs
hashed modes):

- ``"ray"`` (default): raw-Ray hash exchange — map tasks split each
  block into per-coarse-bucket sub-tables (``ray.put`` each), one
  reduce task per bucket concatenates and runs the local groupby.  No
  sort, no sample pass, no barrier beyond the natural data dependency;
  ``Dataset.groupby``'s sample-sort costs ~3 s of pure exchange
  latency on tiny-row inputs regardless of size.  This is the
  documented raw-Ray last resort, same as pipelines/hash_exchange.py.
- ``"dataset"``: Dataset-native ``groupby`` on the coarse key — kept
  as the API-conservative fallback.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data

_MIX = np.uint64(0x9E3779B97F4A7C15)

# Per-worker-process cache for broadcast objects referenced from
# task-pool closures.  Actor pools amortize ray.get in __init__ but pay
# ~1 s pool spin-up per pipeline (measured; warm task workers run the
# same stage in 0.2 s); task closures instead re-deserialize the ref
# every task — this cache gives task pools the actor amortization.
# (Shared home; stages/dedup.py re-exports it.)
_REF_CACHE: dict = {}


def cached_get(ref):
    key = ref.hex()
    if key not in _REF_CACHE:
        if len(_REF_CACHE) > 8:
            _REF_CACHE.clear()
        _REF_CACHE[key] = ray.get(ref)
    return _REF_CACHE[key]


def _coarse_hash(df: pd.DataFrame, keys: list[str], n_buckets: int) -> np.ndarray:
    h = np.zeros(len(df), dtype=np.uint64)
    for k in keys:
        col = df[k]
        if col.dtype == object:
            kv = pd.util.hash_array(col.to_numpy()).astype(np.uint64)
        else:
            kv = col.to_numpy().astype(np.uint64, copy=False)
        h = (h ^ kv) * _MIX
    return (h % np.uint64(n_buckets)).astype(np.int64)


def _local_group_apply(g: pd.DataFrame, keys: list[str], fn,
                       min_group_size: int = 1) -> pd.DataFrame:
    if len(g) == 0:
        return fn(g)
    if min_group_size > 1:
        # vectorised pre-filter: pair-emitting fns (LSH banding et al.)
        # produce nothing from sub-threshold groups, and ~95% of band
        # groups are singletons — calling fn per singleton dominated
        # the reduce wall time (measured 2.9 s of an 11 s dedup)
        sizes = g.groupby(keys, sort=False, dropna=False)[keys[0]].transform("size")
        g = g[sizes.to_numpy() >= min_group_size]
        if len(g) == 0:
            return fn(g)
    # dropna=False: SQL GROUP BY keeps a null-key group; pandas' default
    # would silently DROP null/NaT-keyed rows from every operator built
    # on this exchange (windows, dedup, joins)
    outs = [fn(sub) for _, sub in g.groupby(keys, sort=True, dropna=False)]
    outs = [o for o in outs if len(o)]
    if not outs:
        return fn(g.iloc[0:0])
    return pd.concat(outs, ignore_index=True)


@ray.remote
def _split_block(tbl, keys: list[str], n_buckets: int) -> dict[int, "ray.ObjectRef"]:
    import pyarrow as pa

    df = tbl.to_pandas()
    if len(df) == 0:
        return {}
    cb = _coarse_hash(df, keys, n_buckets)
    out = {}
    order = np.argsort(cb, kind="stable")
    sorted_cb = cb[order]
    bounds = np.flatnonzero(np.r_[True, sorted_cb[1:] != sorted_cb[:-1], True])
    for s_, e_ in zip(bounds[:-1].tolist(), bounds[1:].tolist()):
        b = int(sorted_cb[s_])
        sub = df.iloc[order[s_:e_]]
        out[b] = ray.put(pa.Table.from_pandas(sub, preserve_index=False))
    return out


@ray.remote
def _reduce_bucket(keys: list[str], fn, min_group_size: int, *parts) -> "pa.Table":
    import pyarrow as pa

    df = pd.concat([p.to_pandas() for p in parts], ignore_index=True)
    out = _local_group_apply(df, keys, fn, min_group_size)
    return pa.Table.from_pandas(out, preserve_index=False)


@ray.remote
def _n_rows(t) -> int:
    return t.num_rows


@ray.remote
def _reduce_sum_bucket(keys: list[str], vals: list[str], how: str, *parts) -> "pa.Table":
    import pyarrow as pa

    df = pd.concat([p.to_pandas() for p in parts], ignore_index=True)
    out = df.groupby(keys, sort=False, dropna=False, as_index=False)[vals].agg(how)
    return pa.Table.from_pandas(out, preserve_index=False)


def bucketed_sum(ds: "ray.data.Dataset", keys: list[str],
                 vals: list[str] | str,
                 n_buckets: int | None = None,
                 how: str = "sum") -> "ray.data.Dataset":
    """Distributed ``SUM(vals) GROUP BY keys`` via the same raw-Ray
    coarse-hash exchange as ``bucketed_group_apply``, but with ONE
    vectorised pandas groupby-sum per bucket instead of a per-fine-group
    fn call.  ``Dataset.groupby().sum()``'s sort-based aggregate pays
    per-distinct-group Python overhead (~0.2 ms/group — 50 s measured at
    230k groups on this host), which this removes entirely; output
    columns keep their input names (no ``sum(c)`` renames).

    ``how`` swaps the reduction (``"min"``/``"max"``/any pandas groupby
    reduction): the exchange co-locates EVERY row of a fine group into
    one reduce task, so any per-group reduction over pre-aggregated
    partials is exact — callers feeding partials must pre-aggregate
    with the SAME how (sum-of-sums, min-of-mins)."""
    if isinstance(vals, str):
        vals = [vals]
    if n_buckets is None:
        n_buckets = max(16, 2 * int(ray.cluster_resources().get("CPU", 8)))

    block_refs = ds.to_arrow_refs()

    def _empty():
        import pyarrow as pa

        # preserve the INPUT dtypes (pandas-object empties lose their
        # column types across the Arrow roundtrip)
        try:
            sch = ds.schema(fetch_if_missing=True)
            full = pa.schema(list(zip(sch.names, sch.types)))
            cols = [*keys, *vals]
            return ray.data.from_arrow(
                pa.schema([full.field(c) for c in cols]).empty_table()
            )
        except Exception:
            return ray.data.from_pandas(pd.DataFrame(columns=[*keys, *vals]))

    if not block_refs:
        return _empty()
    split_maps = ray.get([
        _split_block.remote(r, keys, n_buckets) for r in block_refs
    ])
    per_bucket_parts: dict[int, list] = {}
    for m in split_maps:
        for b, r in m.items():
            per_bucket_parts.setdefault(b, []).append(r)
    if not per_bucket_parts:
        return _empty()
    out_refs = [
        _reduce_sum_bucket.remote(keys, vals, how, *parts)
        for _, parts in sorted(per_bucket_parts.items())
    ]
    counts = ray.get([_n_rows.remote(r) for r in out_refs])
    keep = [r for r, c in zip(out_refs, counts) if c > 0]
    if not keep:
        return _empty()
    return ray.data.from_arrow_refs(keep)


def bucketed_group_apply(ds: "ray.data.Dataset", keys: list[str], fn,
                         n_buckets: int | None = None,
                         backend: str = "ray",
                         min_group_size: int = 1) -> "ray.data.Dataset":
    """Apply ``fn`` once per distinct value of ``keys`` (pandas in,
    pandas out), co-locating fine groups via a coarse hash exchange.
    Results are identical across backends (equality-tested); rows of
    one fine group always land in one reduce task.

    ``min_group_size``: fine groups smaller than this are dropped
    VECTORISED before fn runs — only correct for fns that provably
    return nothing on such groups (pair emitters); fns that must see
    singletons (e.g. keep-first dedup) leave it at 1."""
    if n_buckets is None:
        n_buckets = max(16, 2 * int(ray.cluster_resources().get("CPU", 8)))

    if backend == "dataset":
        def coarse(df: pd.DataFrame) -> pd.DataFrame:
            return df.assign(__cb=_coarse_hash(df, keys, n_buckets))

        def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
            return _local_group_apply(g, keys, fn, min_group_size)

        return (
            ds.map_batches(coarse, batch_format="pandas")
            .groupby("__cb")
            .map_groups(per_bucket, batch_format="pandas")
        )

    block_refs = ds.to_arrow_refs()  # distributed blocks; refs only on driver
    if not block_refs:
        # fn must see the FULL input schema even with zero blocks (fns
        # read non-key columns); fall back to keys-only if the schema is
        # unavailable
        try:
            import pyarrow as pa

            sch = ds.schema(fetch_if_missing=True)
            empty_df = pa.schema(list(zip(sch.names, sch.types))).empty_table().to_pandas()
        except Exception:
            empty_df = pd.DataFrame(columns=keys)
        return ray.data.from_pandas(fn(empty_df))

    def _empty_result():
        # fn must see an empty frame with the INPUT's full schema (the
        # dataset backend's empty-group calls carry all columns too, and
        # fns read non-key columns) — fetch one block, slice to 0 rows
        empty_df = ray.get(block_refs[0]).to_pandas().iloc[0:0]
        return ray.data.from_pandas(fn(empty_df))

    split_maps = ray.get([
        _split_block.remote(r, keys, n_buckets) for r in block_refs
    ])  # dicts of {bucket: ref} — tiny
    per_bucket_parts: dict[int, list] = {}
    for m in split_maps:
        for b, r in m.items():
            per_bucket_parts.setdefault(b, []).append(r)
    if not per_bucket_parts:
        return _empty_result()
    out_refs = [
        _reduce_bucket.remote(keys, fn, min_group_size, *parts)
        for _, parts in sorted(per_bucket_parts.items())
    ]
    # drop empty outputs so pandas-object empties can't pollute the
    # unioned schema (metadata-only fetch: ints, not tables)
    counts = ray.get([_n_rows.remote(r) for r in out_refs])
    keep = [r for r, c in zip(out_refs, counts) if c > 0]
    if not keep:
        return _empty_result()
    return ray.data.from_arrow_refs(keep)
