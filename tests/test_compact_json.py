"""Compaction job + JSON-source ingestion parity."""

import json
import os
import shutil

import pyarrow.compute as pc
import pytest

from skar_ray.corpus import ensure_corpus, read_corpus_table
from skar_ray.pipelines.compact_job import run_compact_job
from skar_ray.pipelines.decode_job import decoded_dataset, run_verify_job
from skar_ray.pipelines.encode_job import run_encode_job
from skar_ray.state import manifest as manifest_mod

SRC = "/tmp/skar_pytest_compact_src"
DST = "/tmp/skar_pytest_compact_dst"


def test_compact_merges_partitions(ray_session):
    d = ensure_corpus(2000)
    corpus = os.path.join(d, "corpus.parquet")
    shutil.rmtree(SRC, ignore_errors=True)
    shutil.rmtree(DST, ignore_errors=True)
    # encode deliberately fragmented (tiny partitions)
    run_encode_job(corpus, SRC, target_partition_bytes=1 << 20, chunk_target_bytes=1 << 20)
    n_src = len(manifest_mod.scan_manifests(SRC))
    assert n_src >= 5
    r = run_compact_job(SRC, DST, target_partition_bytes=8 << 20, chunk_target_bytes=4 << 20)
    assert r["rows_match"], r
    # repartition-invariant row-digest union must survive the re-partitioning
    assert r["digests_match"] is True, r
    assert r["dest_partitions"] < n_src
    # compacted output still decodes bit-identically vs the ORIGINAL corpus
    v = run_verify_job(corpus, DST)
    assert v["rows_match"] and v["digests_verified"]


def test_json_source_ingestion(ray_session, tmp_path):
    """skar ingests JSON (RPC payloads); our analog: a JSONL corpus read
    with ray.data.read_json, encoded by the same engine, verified."""
    import ray.data

    d = ensure_corpus(2000)
    t = read_corpus_table(os.path.join(d, "corpus.parquet")).slice(0, 300)
    jdir = tmp_path / "json_src"
    jdir.mkdir()
    rows = t.to_pylist()
    for i in range(3):
        with open(jdir / f"part-{i}.jsonl", "w") as f:
            for r in rows[i * 100 : (i + 1) * 100]:
                f.write(json.dumps(r) + "\n")
    ds = ray.data.read_json(str(jdir))
    assert ds.count() == 300
    # shard-encode the JSON-sourced dataset directly
    out = str(tmp_path / "enc")
    from skar_ray.stages.encoder import ShardEncoder

    summary = ds.map_batches(
        ShardEncoder,
        fn_constructor_kwargs=dict(out_dir=out, chunk_target_bytes=1 << 20, input_fingerprint="json"),
        batch_format="pyarrow", batch_size=None, concurrency=2,
    ).to_pandas()
    assert summary["n_rows"].sum() == 300
    dec = decoded_dataset(out, verify=True)
    assert dec.count() == 300


def test_recompact_sweeps_stale_dest_partitions(ray_session):
    """Re-compacting a DIFFERENT (smaller) source into a previously-used
    dest_dir must sweep partition ids the new plan no longer produces —
    stale 'done' manifests would otherwise be served by every query and
    poison the digest comparison (same contract as run_encode_job)."""
    src_big = "/tmp/skar_pytest_recompact_src_big"
    src_small = "/tmp/skar_pytest_recompact_src_small"
    dst = "/tmp/skar_pytest_recompact_dst"
    for p in (src_big, src_small, dst):
        shutil.rmtree(p, ignore_errors=True)

    big = os.path.join(ensure_corpus(2000), "corpus.parquet")
    small = os.path.join(ensure_corpus(500), "corpus.parquet")
    run_encode_job(big, src_big, target_partition_bytes=1 << 20, chunk_target_bytes=1 << 20)
    run_encode_job(small, src_small, target_partition_bytes=1 << 20, chunk_target_bytes=1 << 20)

    r1 = run_compact_job(src_big, dst, target_partition_bytes=8 << 20, chunk_target_bytes=4 << 20)
    assert r1["rows_match"] and r1["digests_match"] is True

    r2 = run_compact_job(src_small, dst, target_partition_bytes=8 << 20, chunk_target_bytes=4 << 20)
    assert r2["rows_match"], r2
    assert r2["digests_match"] is True, r2  # stale big-corpus partitions swept
    ms = manifest_mod.scan_manifests(dst)
    assert len(ms) == r2["dest_partitions"]
    files = {f for f in os.listdir(dst) if f.endswith(".skarc")}
    assert files == {m.data_file for m in ms.values()}
    v = run_verify_job(small, dst)
    assert v["rows_match"] and v["digests_verified"]
    for p in (src_big, src_small, dst):
        shutil.rmtree(p, ignore_errors=True)
