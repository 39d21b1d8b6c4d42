"""Query-over-encoded-partitions: projection, DNF filters, pruning."""

import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from skar_ray.corpus import read_corpus_table
import pytest

from skar_ray.corpus import ensure_corpus
from skar_ray.pipelines.encode_job import run_encode_job
from skar_ray.pipelines.query_encoded import prune_partitions, query_encoded
from skar_ray.state import manifest as manifest_mod

OUT = "/tmp/skar_pytest_qenc"
N = 2000


@pytest.fixture(scope="module")
def encoded(ray_session):
    d = ensure_corpus(N)
    corpus = os.path.join(d, "corpus.parquet")
    shutil.rmtree(OUT, ignore_errors=True)
    run_encode_job(corpus, OUT, target_partition_bytes=2 << 20, chunk_target_bytes=1 << 20)
    return corpus


def test_projection_and_filter_match_source(encoded):
    src = read_corpus_table(encoded)
    langs = ["python", "rust"]
    want = (
        src.filter(pc.is_in(src["lang"], value_set=pa.array(langs)))
        .select(["repo", "path", "lang"])
        .to_pandas()
        .sort_values(["repo", "path", "lang"])
        .reset_index(drop=True)
    )
    got = (
        query_encoded(OUT, columns=["repo", "path", "lang"], filters=[[("lang", "in", langs)]])
        .to_pandas()
        .sort_values(["repo", "path", "lang"])
        .reset_index(drop=True)
    )
    assert got.equals(want)


def test_dnf_or_semantics(encoded):
    src = read_corpus_table(encoded)
    m1 = pc.equal(src["lang"], "go")
    m2 = pc.and_(pc.equal(src["lang"], "python"), pc.starts_with(src["path"], pattern="src/"))
    want = src.filter(pc.or_(m1, m2)).num_rows
    got = query_encoded(
        OUT,
        columns=["repo", "path", "lang"],
        filters=[[("lang", "==", "go")], [("lang", "==", "python"), ("path", "prefix", "src/")]],
    ).count()
    assert got == want


def test_partition_pruning_skips(encoded):
    manifests = manifest_mod.scan_manifests(OUT)
    assert len(manifests) >= 3
    # pick a repo that lives in exactly one partition
    repo_of = {}
    for pid, m in manifests.items():
        for r in (m.extra.get("stats", {}).get("repo", {}).get("distinct") or []):
            repo_of.setdefault(r, set()).add(pid)
    single = [r for r, pids in repo_of.items() if len(pids) == 1]
    assert single, "expected some repo confined to one partition"
    r = single[0]
    kept = prune_partitions(manifests, [[("repo", "==", r)]])
    assert len(kept) < len(manifests)
    # and the query still returns the right rows
    src = read_corpus_table(encoded)
    want = src.filter(pc.equal(src["repo"], r)).num_rows
    assert query_encoded(OUT, columns=["repo"], filters=[[("repo", "==", r)]]).count() == want


def test_limit(encoded):
    assert query_encoded(OUT, columns=["repo"], limit=7).count() == 7


def test_impossible_filter_prunes_everything(encoded):
    manifests = manifest_mod.scan_manifests(OUT)
    kept = prune_partitions(manifests, [[("repo", "==", "no-such/repo")]])
    assert kept == []


def test_chunk_pruning_correct_and_effective(encoded):
    """Row-group-analog pruning: chunk min/max on the sorted path column
    lets a prefix query skip chunks, with identical final results."""
    import glob

    from skar_ray.state import container

    paths = sorted(glob.glob(os.path.join(OUT, "*.skarc")))
    multi = [p for p in paths if len(container.read_header(p)[0]["chunks"]) > 1]
    assert multi, "need a multi-chunk container for this test"
    p = multi[0]
    header, _ = container.read_header(p)
    # probe with the max path of the LAST chunk's minmax → prunes earlier chunks
    last_mm = header["chunks"][-1]["columns"]
    mm = {cm["name"]: cm.get("minmax") for cm in last_mm}
    probe = mm["path"][0]
    dnf = [[("path", ">=", probe)]]
    full = container.read_container(p, columns=["path"])
    pruned = container.read_container(p, columns=["path"], dnf=dnf)
    assert pruned.num_rows <= full.num_rows
    import pyarrow.compute as pc2

    want = full.filter(pc2.greater_equal(full["path"], probe)).column("path").to_pylist()
    got = pruned.filter(pc2.greater_equal(pruned["path"], probe)).column("path").to_pylist()
    assert sorted(got) == sorted(want)
