"""Store introspection — what the reference's folder/row-group index
exposes (db/mod.rs:217-305 range scans), as an operator: per-column
codec choices and byte accounting aggregated over a store's manifests
(driver-small — one row per partition × column), plus partition-level
health (row counts, digests present, fingerprints)."""

from __future__ import annotations

import pandas as pd

from ..state import manifest as manifest_mod


def store_stats(out_dir: str) -> pd.DataFrame:
    """One row per column: chosen codec(s), raw/encoded byte totals,
    achieved ratio — straight from manifests, no container reads."""
    rows = []
    for pid, m in sorted(manifest_mod.scan_manifests(out_dir).items()):
        for col, st in (m.columns or {}).items():
            rows.append((col, st.get("codec"), st.get("raw_bytes", 0), st.get("enc_bytes", 0)))
    if not rows:
        return pd.DataFrame(columns=["column", "codecs", "raw_bytes", "enc_bytes", "ratio"])
    df = pd.DataFrame(rows, columns=["column", "codec", "raw_bytes", "enc_bytes"])
    agg = (
        df.groupby("column", as_index=False)
        .agg(codecs=("codec", lambda s: ",".join(sorted(set(s)))),
             raw_bytes=("raw_bytes", "sum"), enc_bytes=("enc_bytes", "sum"))
    )
    agg["ratio"] = (agg["raw_bytes"] / agg["enc_bytes"].clip(lower=1)).round(2)
    return agg.sort_values("column").reset_index(drop=True).astype(
        {"raw_bytes": "int64", "enc_bytes": "int64"}
    )


def store_value_counts(out_dir: str, column: str) -> pd.DataFrame:
    """GROUP BY ``column`` → COUNT(*) over an encoded store WITHOUT
    decoding the column: one Ray task per partition seeks straight to
    the column's chunk blobs and counts on the encoded form
    (``encoded_value_counts`` — dict index bincount / rle run-length
    sums), falling back to decode+value_counts for codecs that don't
    support pushdown.  Per-partition results are value-cardinality-
    sized dicts, merged on the driver (same scale class as the
    manifests themselves)."""
    import ray

    from ..codecs import auto
    from ..state import container

    ms = manifest_mod.scan_manifests(out_dir)

    @ray.remote
    def part_counts(path: str) -> dict:
        import os

        import pyarrow.compute as pc

        header, blob_start = container.read_header(path)
        agg: dict = {}
        with open(path, "rb") as f:
            for ch in header["chunks"]:
                cm = next(c for c in ch["columns"] if c["name"] == column)
                f.seek(blob_start + cm["offset"])
                blob = f.read(cm["length"])
                d = container.encoded_value_counts(blob, cm)
                if d is None:
                    arr = auto.decode_column(blob, cm["meta"], cm["page"], cm["payload_len"])
                    vc = pc.value_counts(arr)
                    d = {r["values"]: r["counts"] for r in vc.to_pylist()}
                for v, c in d.items():
                    agg[v] = agg.get(v, 0) + c
        return agg

    import os

    refs = [
        part_counts.remote(os.path.join(out_dir, m.data_file))
        for _, m in sorted(ms.items())
    ]
    total: dict = {}
    for agg in ray.get(refs):
        for v, c in agg.items():
            total[v] = total.get(v, 0) + c
    out = pd.DataFrame(
        {"value": list(total.keys()), "n": list(total.values())}
    )
    return out.sort_values("value").reset_index(drop=True).astype({"n": "int64"})


def store_health(out_dir: str) -> dict:
    """Partition-level invariants a monitoring job would watch."""
    ms = manifest_mod.scan_manifests(out_dir)
    return {
        "partitions": len(ms),
        "rows": int(sum(m.n_rows for m in ms.values())),
        "raw_bytes": int(sum(m.raw_bytes for m in ms.values())),
        "enc_bytes": int(sum(m.enc_bytes for m in ms.values())),
        "all_digests_present": all(bool(m.content_sha256) for m in ms.values()),
        "fingerprints": sorted({m.input_fingerprint for m in ms.values()}),
    }
