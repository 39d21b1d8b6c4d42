"""Training-data prep stages: sequence packing, split, unigram LM,
k-means — pure-Python reference checks (the SQL oracles run in
tools/check_oracles.py; these pin the semantics on adversarial
shapes the sf corpus doesn't exercise)."""

import numpy as np
import pandas as pd
import pytest

from skar_ray.stages import training


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data

    rng = np.random.default_rng(7)
    rows = []
    for i in range(400):
        lang = ["en", "de", "code"][i % 3]
        n_tok = int(rng.integers(0, 40))
        rows.append(
            {
                "doc_id": i,
                "lang": lang,
                "text": " ".join(f"w{int(rng.integers(0, 50))}" for _ in range(n_tok)),
                "n_chars": 0,
            }
        )
    df = pd.DataFrame(rows)
    df["n_chars"] = df["text"].str.len().astype("int64")
    return ray.data.from_pandas(df), df


def test_pack_sequences_matches_pandas(docs_ds):
    ds, df = docs_ds
    got = training.pack_sequences(ds, budget=64, shard_size=32)
    ref = df.copy()
    ref["n"] = ref["text"].str.count(r"\S+")
    ref = ref.sort_values(["lang", "doc_id"])
    ref["prior"] = ref.groupby("lang")["n"].cumsum() - ref["n"]
    ref["seq_id"] = ref["prior"] // 64
    ref["tok_start"] = ref["prior"] % 64
    ref = ref.sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == ref["doc_id"].tolist()
    assert got["seq_id"].tolist() == ref["seq_id"].tolist()
    assert got["tok_start"].tolist() == ref["tok_start"].tolist()


def test_pack_sequences_shard_boundaries_exact(docs_ds):
    """Offsets must chain exactly across shards: the doc straddling a
    budget boundary lands mid-sequence regardless of shard size."""
    ds, _ = docs_ds
    a = training.pack_sequences(ds, budget=64, shard_size=7)
    b = training.pack_sequences(ds, budget=64, shard_size=4096)
    pd.testing.assert_frame_equal(a, b)


def test_split_assign_fractions_and_determinism(docs_ds):
    ds, df = docs_ds
    got = training.split_assign(ds)
    tot = got.groupby("split")["n_docs"].sum()
    n = tot.sum()
    assert tot["train"] / n == pytest.approx(0.8, abs=0.1)
    assert tot["val"] / n == pytest.approx(0.09, abs=0.08)
    # deterministic: re-run identical
    again = training.split_assign(ds)
    pd.testing.assert_frame_equal(got, again)
    # every (lang) bucket accounted for
    assert got["n_docs"].sum() == len(df)
    assert got["sum_chars"].sum() == int(df["n_chars"].sum())


def test_unigram_commonness_reference(docs_ds):
    ds, df = docs_ds
    got = training.unigram_commonness(ds)
    toks = df.set_index("doc_id")["text"].str.findall(r"\S+")
    freq: dict = {}
    for ts in toks:
        for t in ts:
            freq[t] = freq.get(t, 0) + 1
    for doc_id, ts in toks.items():
        row = got[got["doc_id"] == doc_id].iloc[0]
        fs = sum(freq[t] for t in ts)
        assert row["n_tokens"] == len(ts)
        assert row["freq_sum"] == fs
        expected = fs / len(ts) if ts else 0.0
        assert row["commonness"] == expected
    assert len(got) == len(df)


def test_unigram_commonness_topk_infinite_equals_uncapped(docs_ds):
    """K >= |vocab| must be byte-identical to the uncapped model — the
    cap is a pure refinement, not a different scorer."""
    ds, df = docs_ds
    uncapped = training.unigram_commonness(ds)
    capped = training.unigram_commonness(ds, top_k=10_000_000)
    pd.testing.assert_frame_equal(uncapped, capped)


def test_unigram_commonness_topk_matches_reference(docs_ds):
    """Small K: kept vocab = top-K by (count desc, token asc); tokens
    outside it contribute 0 to freq_sum while n_tokens stays total."""
    ds, df = docs_ds
    K = 7
    got = training.unigram_commonness(ds, top_k=K)
    toks = df.set_index("doc_id")["text"].str.findall(r"\S+")
    freq: dict = {}
    for ts in toks:
        for t in ts:
            freq[t] = freq.get(t, 0) + 1
    kept = set(
        t for t, _ in sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:K]
    )
    for doc_id, ts in toks.items():
        row = got[got["doc_id"] == doc_id].iloc[0]
        fs = sum(freq[t] for t in ts if t in kept)
        assert row["n_tokens"] == len(ts)
        assert row["freq_sum"] == fs, doc_id
        assert row["commonness"] == (fs / len(ts) if ts else 0.0)


def test_kmeans_planted_clusters(ray_session):
    """Three tight planted blobs -> every member lands with its blob's
    seed; exactness vs a single-process numpy replica of the integer
    recurrence."""
    import ray.data

    rng = np.random.default_rng(3)
    centers = rng.normal(scale=0.4, size=(3, 8))
    vecs, ids = [], []
    for b in range(3):
        for i in range(40):
            vecs.append(centers[b] + rng.normal(scale=0.01, size=8))
            # interleave ids so the k smallest vec_ids (the init seeds)
            # land one per blob
            ids.append(i * 3 + b)
    vecs = np.array(vecs, dtype=np.float32)
    df = pd.DataFrame({"vec_id": ids, "embedding": list(vecs)})
    ds = ray.data.from_pandas(df)
    got = training.kmeans_clusters(ds, k=3, iters=2)

    # numpy replica of the exact integer recurrence
    Q = training._quantize(vecs.astype(np.float64), 1000, 1024)
    C = Q[np.argsort(ids)[:3]]
    order = np.argsort(ids)
    Qo = Q[order]
    d2 = ((Qo[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    a = d2.argmin(axis=1)
    newC = C.copy()
    for j in range(3):
        m = a == j
        if m.any():
            newC[j] = (2 * Qo[m].sum(axis=0) + m.sum()) // (2 * m.sum())
    d2 = ((Qo[:, None, :] - newC[None, :, :]) ** 2).sum(axis=2)
    want = d2.argmin(axis=1)
    assert got.sort_values("vec_id")["cluster"].tolist() == want.tolist()

    # blob purity: each planted blob maps to exactly one cluster
    lab = got.set_index("vec_id")["cluster"]
    for b in range(3):
        members = lab.loc[[i * 3 + b for i in range(40)]]
        assert members.nunique() == 1


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    """If a centroid captures nothing in round 1 it must survive
    unchanged (the COALESCE branch in the SQL oracle)."""
    import ray.data

    # 4 identical points + k=2: init centroids are points 0 and 1
    # (identical!), so cluster 1 gets zero members (ties -> cluster 0)
    vecs = np.tile(np.arange(8, dtype=np.float32), (4, 1)) * 0.01
    df = pd.DataFrame({"vec_id": range(4), "embedding": list(vecs)})
    got = training.kmeans_clusters(ray.data.from_pandas(df), k=2, iters=2)
    assert got["cluster"].tolist() == [0, 0, 0, 0]


def test_postings_batch_ordinals(ray_session):
    import ray.data
    from skar_ray.stages import text as T

    df = pd.DataFrame({"doc_id": [5, 9], "text": ["a b a c b", ""]})
    out = ray.data.from_pandas(df).map_batches(
        T.postings_batch, batch_format="pandas"
    ).to_pandas().sort_values(["tok", "doc_id"]).reset_index(drop=True)
    want = pd.DataFrame(
        {"tok": ["a", "b", "c"], "doc_id": [5, 5, 5], "first_pos": [1, 2, 4]}
    )
    pd.testing.assert_frame_equal(out, want)


def test_length_quantiles_interpolation(ray_session):
    import ray.data
    from skar_ray.stages import text as T

    # 4 values -> median interpolates between the 2nd and 3rd, p90
    # between the 3rd and 4th: h = 3*0.9 = 2.7
    df = pd.DataFrame(
        {"lang": ["en"] * 4, "n_chars": [10, 20, 40, 100], "doc_id": range(4)}
    )
    out = T.length_quantile_stats(ray.data.from_pandas(df))
    assert out["n"].tolist() == [4]
    assert out["median_chars"].tolist() == [30.0]
    # ulp-level drift vs the closed form is fine (the oracle hash
    # rounds to 9 decimals)
    assert out["p90_chars"].iloc[0] == pytest.approx(40 + 0.7 * 60, abs=1e-9)


def test_decontaminate_bloom_equals_exact(ray_session, tmp_path):
    """The SBBF-pruned two-stage path must return exactly what the
    broadcast-set exact path returns (no false negatives by SBBF
    construction; false positives killed by the exact semi-join)."""
    import numpy as np

    from skar_ray.pipelines.registry import decontaminate, decontaminate_bloom

    rng = np.random.default_rng(13)
    words = [f"w{i}" for i in range(60)]
    rows = []
    for i in range(120):
        toks = [words[int(rng.integers(0, 60))] for _ in range(20)]
        rows.append({"doc_id": i, "text": " ".join(toks), "lang": "en",
                     "source": "s", "n_chars": 0})
    # plant a shared 8-gram between a benchmark doc (id 30) and two
    # non-benchmark docs
    shared = " ".join(words[:8])
    rows[30]["text"] += " " + shared
    rows[41]["text"] += " " + shared
    rows[77]["text"] = shared + " " + rows[77]["text"]
    df = pd.DataFrame(rows)
    df["n_chars"] = df["text"].str.len().astype("int64")
    p = tmp_path / "documents.parquet"
    df.to_parquet(p, index=False)

    exact = decontaminate(str(tmp_path))
    bloom = decontaminate_bloom(str(tmp_path))
    pd.testing.assert_frame_equal(exact, bloom)
    assert set(exact["doc_id"]) >= {41, 77}
