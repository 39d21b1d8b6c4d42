"""Decode + verify job — the read-back half of the round-trip proof.

Mirrors the reference's validate-after-write step
(/root/reference/skar/src/skar_runner.rs:309-312, validate_parquet.rs:17-66):
manifest rows fan out to a ``DecoderActor`` pool; each partition is
decoded and its per-row sha256 digest recomputed and compared with the
digest the encoder stored (which was derived from the ORIGINAL data).
Every partition passing ⇒ decoded bytes are bit-identical to the
pre-encode bytes, partition-complete by construction.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from ..stages.decoder import DecoderActor
from ..state import manifest as manifest_mod


def manifests_dataset(out_dir: str) -> "ray.data.Dataset":
    rows = [
        {
            "partition_id": m.partition_id,
            "data_file": m.data_file,
            "n_rows": m.n_rows,
            "content_sha256": m.content_sha256,
        }
        for m in manifest_mod.scan_manifests(out_dir).values()
    ]
    return ray.data.from_items(rows)


def decoded_dataset(
    out_dir: str,
    columns: list[str] | None = None,
    verify: bool = False,
    concurrency=(1, 8),
) -> "ray.data.Dataset":
    mds = manifests_dataset(out_dir)
    return mds.map_batches(
        DecoderActor,
        fn_constructor_kwargs=dict(out_dir=out_dir, columns=columns, verify=verify),
        batch_format="pyarrow",
        batch_size=1,  # one partition per call; partitions are size-capped
        concurrency=concurrency,
    )


def run_verify_job(corpus_path: str, out_dir: str) -> dict:
    """Decode every partition with digest verification; cross-check totals
    against the source corpus (row counts must match exactly)."""
    decoded = decoded_dataset(out_dir, verify=True)
    decoded_rows = decoded.count()
    src_rows = ray.data.read_parquet(corpus_path, columns=["repo"]).count()
    manifests = manifest_mod.scan_manifests(out_dir)
    return {
        "partitions": len(manifests),
        "decoded_rows": decoded_rows,
        "source_rows": src_rows,
        "rows_match": decoded_rows == src_rows,
        "digests_verified": True,  # DecoderActor raises on any mismatch
    }
