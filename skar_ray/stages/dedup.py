"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

All follow the same scalable shape:
  1. vectorised per-batch signature/fingerprint (``map_batches``);
  2. explode to (bucket_key, doc_id) rows;
  3. ``groupby(bucket)`` — the only shuffle, over tiny signature rows,
     never the documents themselves (pre-aggregation pattern);
  4. candidate pairs from buckets; exact verification against a
     broadcast doc-feature table (``ray.put`` once — the reference's
     broadcast-semi-join pattern, /root/reference/skar/src/query/
     execution/mod.rs:86-95,183-185).  At 100 TB the verify stage
     swaps the broadcast for a partitioned hash join on doc_id; the
     bucketing stages are unchanged.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ..runtime import pool_size

_MERSENNE = (1 << 61) - 1


def _hash_shingles(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-char-shingle hashes (uint64) of a document."""
    b = text.encode()
    if len(b) < k:
        return np.array([hash64_bytes(b)], dtype=np.uint64) if b else np.array([], dtype=np.uint64)
    a = np.frombuffer(b, dtype=np.uint8)
    win = np.lib.stride_tricks.sliding_window_view(a, k)
    # polynomial hash per window, vectorised
    powers = np.uint64(1000003) ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    h = (win.astype(np.uint64) * powers).sum(axis=1, dtype=np.uint64)
    return np.unique(h)


def hash64_bytes(b: bytes) -> np.uint64:
    return np.uint64(int.from_bytes(hashlib.blake2b(b, digest_size=8).digest(), "big"))


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)


# ------------------------------------------------------------------ exact

def add_content_hash(batch: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    batch = batch.copy()
    batch["content_hash"] = batch[col].map(lambda s: hashlib.md5(s.encode()).hexdigest())
    return batch


def exact_dedup(ds: "ray.data.Dataset", col: str = "text", id_col: str = "doc_id") -> "ray.data.Dataset":
    """Keep the minimum id per identical content (hash-partitioned)."""
    hashed = ds.map_batches(lambda b: add_content_hash(b, col), batch_format="pandas")

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({id_col: [g[id_col].min()]})

    return hashed.groupby("content_hash").map_groups(keep_first, batch_format="pandas")


# ---------------------------------------------------------------- minhash

class MinHasher:
    """Per-actor state: the (a, b) permutation coefficients, built once."""

    def __init__(self, num_perm: int = 128, k: int = 5, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
        self.k = k
        self.num_perm = num_perm

    def signature(self, text: str) -> np.ndarray:
        sh = _hash_shingles(text, self.k)
        if len(sh) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        # (a*x + b) mod p, min over shingles, per permutation
        x = sh.astype(np.uint64)[:, None]
        vals = (x * self.a[None, :] + self.b[None, :]) % np.uint64(_MERSENNE)
        return vals.min(axis=0)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack([self.signature(s) for s in batch["text"]])
        return pd.DataFrame({"doc_id": batch["doc_id"].to_numpy(), "sig": list(sigs)})


def _bands(sig: np.ndarray, n_bands: int) -> list[int]:
    rows = len(sig) // n_bands
    out = []
    for b in range(n_bands):
        h = hashlib.blake2b(sig[b * rows : (b + 1) * rows].tobytes(), digest_size=8)
        out.append(int.from_bytes(h.digest(), "big") >> 1)
    return out


def minhash_lsh_pairs(
    ds: "ray.data.Dataset",
    threshold: float = 0.8,
    num_perm: int = 128,
    n_bands: int = 16,
    k: int = 5,
) -> pa.Table:
    """Near-duplicate pairs (doc_a < doc_b, jaccard >= threshold).

    shingle→minhash→band→bucket-groupby→candidates→exact-verify.
    """
    sigs = ds.map_batches(MinHasher, fn_constructor_kwargs=dict(num_perm=num_perm, k=k),
                          batch_format="pandas", concurrency=pool_size())

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, sig in zip(batch["doc_id"], batch["sig"]):
            for band_id, bh in enumerate(_bands(np.asarray(sig, dtype=np.uint64), n_bands)):
                rows.append((band_id, bh, doc_id))
        return pd.DataFrame(rows, columns=["band_id", "band_hash", "doc_id"])

    buckets = sigs.map_batches(explode, batch_format="pandas")

    def pairs_of(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].tolist())
        out = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
        return pd.DataFrame(out, columns=["doc_a", "doc_b"])

    cand = (
        buckets.groupby(["band_id", "band_hash"])
        .map_groups(pairs_of, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    if len(cand) == 0:
        return pa.table({"doc_a": pa.array([], type=pa.int64()),
                         "doc_b": pa.array([], type=pa.int64()),
                         "jaccard": pa.array([], type=pa.float64())})

    # exact verification against broadcast shingle sets (small side)
    docs = ds.select_columns(["doc_id", "text"]).to_pandas()
    shingles = {int(r.doc_id): _hash_shingles(r.text, k) for r in docs.itertuples()}
    sh_ref = ray.put(shingles)

    @ray.remote
    def verify(pairs: pd.DataFrame, ref) -> pd.DataFrame:
        out = []
        for r in pairs.itertuples():
            j = jaccard(ref[int(r.doc_a)], ref[int(r.doc_b)])
            if j >= threshold:
                out.append((int(r.doc_a), int(r.doc_b), j))
        return pd.DataFrame(out, columns=["doc_a", "doc_b", "jaccard"])

    chunks = np.array_split(cand, max(1, len(cand) // 2000))
    parts = ray.get([verify.remote(c, sh_ref) for c in chunks if len(c)])
    res = pd.concat(parts, ignore_index=True) if parts else pd.DataFrame(columns=["doc_a", "doc_b", "jaccard"])
    res = res.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(res.astype({"doc_a": "int64", "doc_b": "int64", "jaccard": "float64"}))


# ---------------------------------------------------------------- simhash

class SimHasher:
    """64-bit SimHash over token features; state (token hash fn) per actor."""

    def __init__(self, seed: int = 42):
        import re

        self.tok = re.compile(r"\w+")
        self.seed = seed.to_bytes(4, "big")

    def simhash(self, text: str) -> int:
        toks = self.tok.findall(text.lower())
        if not toks:
            return 0
        hashes = np.array(
            [int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8, salt=self.seed).digest(), "big") for t in set(toks)],
            dtype=np.uint64,
        )
        bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(),
                "simhash": np.array([self.simhash(s) for s in batch["text"]], dtype=np.uint64).astype(np.int64),
            }
        )


def simhash_pairs(ds: "ray.data.Dataset", max_hamming: int = 3) -> pa.Table:
    """Pairs within hamming<=max_hamming via 4×16-bit band blocking
    (any pair ≤3 bits apart shares ≥1 exact 16-bit band — pigeonhole)."""
    sigs = ds.map_batches(SimHasher, batch_format="pandas", concurrency=pool_size())

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        h = batch["simhash"].to_numpy().astype(np.uint64)
        rows = []
        for band in range(4):
            part = ((h >> np.uint64(band * 16)) & np.uint64(0xFFFF)).astype(np.int64)
            rows.append(pd.DataFrame({"band": band, "key": part, "doc_id": batch["doc_id"], "simhash": batch["simhash"]}))
        return pd.concat(rows, ignore_index=True)

    buckets = sigs.map_batches(explode, batch_format="pandas")

    def pairs_of(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        recs = list(zip(g["doc_id"], g["simhash"]))
        out = []
        for i in range(len(recs)):
            for jj in range(i + 1, len(recs)):
                a, ha = recs[i]
                b, hb = recs[jj]
                d = bin(int(ha) ^ int(hb)).count("1")
                if d <= max_hamming:
                    out.append((int(a), int(b), d))
        return pd.DataFrame(out, columns=["doc_a", "doc_b", "hamming"])

    res = buckets.groupby(["band", "key"]).map_groups(pairs_of, batch_format="pandas").to_pandas()
    if len(res) == 0 or "doc_a" not in res.columns:
        return pa.table({"doc_a": pa.array([], type=pa.int64()),
                         "doc_b": pa.array([], type=pa.int64()),
                         "hamming": pa.array([], type=pa.int64())})
    res = res.drop_duplicates(subset=["doc_a", "doc_b"]).sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(res.astype({"doc_a": "int64", "doc_b": "int64", "hamming": "int64"}))


# --------------------------------------------------------- ngram jaccard

def ngram_jaccard_pairs(ds: "ray.data.Dataset", threshold: float = 0.5, k: int = 5,
                        group_col: str = "lang") -> pa.Table:
    """Exact n-gram Jaccard within blocking groups (documented
    partitioning assumption: near-dups share `group_col`; cross-group
    dups are the MinHash path's job)."""

    def within(g: pd.DataFrame) -> pd.DataFrame:
        sh = [(int(r.doc_id), _hash_shingles(r.text, k)) for r in g.itertuples()]
        sh.sort()
        out = []
        for i in range(len(sh)):
            for jj in range(i + 1, len(sh)):
                j = jaccard(sh[i][1], sh[jj][1])
                if j >= threshold:
                    out.append((sh[i][0], sh[jj][0], j))
        return pd.DataFrame(out, columns=["doc_a", "doc_b", "jaccard"])

    res = ds.groupby(group_col).map_groups(within, batch_format="pandas").to_pandas()
    if len(res) == 0 or "doc_a" not in res.columns:
        return pa.table({"doc_a": pa.array([], type=pa.int64()),
                         "doc_b": pa.array([], type=pa.int64()),
                         "jaccard": pa.array([], type=pa.float64())})
    res = res.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(res.astype({"doc_a": "int64", "doc_b": "int64", "jaccard": "float64"}))


# ---------------------------------------------------------- clustering

def connected_components(pairs: pd.DataFrame, a: str = "doc_a", b: str = "doc_b",
                         max_rounds: int = 50) -> pd.DataFrame:
    """Connected components over near-dup pairs via min-label
    propagation (vectorised rounds; converges in O(log diameter) —
    near-dup clusters are shallow).  Driver-side over the PAIR set only
    (pairs ≪ corpus); at cluster scale the identical iteration runs as
    `groupby(node).min()` rounds over a pairs Dataset.

    Returns (node, label) with label = min doc_id of the component.
    """
    edges = pairs[[a, b]].to_numpy(dtype=np.int64)
    nodes = np.unique(edges)
    label = {int(n): int(n) for n in nodes}
    for _ in range(max_rounds):
        changed = False
        for x, y in edges:
            lx, ly = label[int(x)], label[int(y)]
            m = min(lx, ly)
            if lx != m:
                label[int(x)] = m
                changed = True
            if ly != m:
                label[int(y)] = m
                changed = True
        # path-compress
        for n in label:
            r = n
            while label[r] != r:
                r = label[r]
            label[n] = r
        if not changed:
            break
    return pd.DataFrame({"node": list(label), "label": [label[n] for n in label]}).astype("int64")


def dedup_keep_list(ds: "ray.data.Dataset", pairs: pd.DataFrame,
                    id_col: str = "doc_id") -> pd.DataFrame:
    """The actual dedup deliverable: keep the min-id document of every
    near-dup cluster plus all unpaired documents."""
    comp = connected_components(pairs)
    drop = set(comp.loc[comp["node"] != comp["label"], "node"].tolist())

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[~batch[id_col].isin(drop)][[id_col]]

    out = ds.map_batches(keep, batch_format="pandas").to_pandas()
    return out.sort_values(id_col).reset_index(drop=True)


# ------------------------------------------------------ embedding cosine

def embedding_dup_pairs(ds: "ray.data.Dataset", threshold: float = 0.9,
                        n_tables: int = 8, n_planes: int = 6, seed: int = 42) -> pa.Table:
    """Near-dup pairs by cosine >= threshold.

    Multi-table random-hyperplane LSH (``n_tables`` independent sign
    sketches of ``n_planes`` bits — recall ≈ 1-(1-p^b)^T, ≈0.98 at
    cosine 0.9 with 8×6) → exact cosine verification within buckets.
    Unit-normalisation and bucketing are vectorised per batch.
    """
    first = ds.take(1)[0]
    dim = len(first["embedding"])
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_tables, dim, n_planes))
    planes_ref = ray.put(planes)

    class Bucketer:
        def __init__(self, ref):
            self.planes = ray.get(ref)  # broadcast once per actor

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            m = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            unit = m / norms
            frames = []
            for t in range(self.planes.shape[0]):
                signs = (unit @ self.planes[t] > 0).astype(np.int64)
                key = (signs << np.arange(signs.shape[1])).sum(axis=1)
                frames.append(
                    pd.DataFrame(
                        {
                            "table": t,
                            "bucket": key,
                            "vec_id": batch["vec_id"].to_numpy(),
                            "unit": list(unit),
                        }
                    )
                )
            return pd.concat(frames, ignore_index=True)

    buckets = ds.map_batches(Bucketer, fn_constructor_args=(planes_ref,),
                             batch_format="pandas", concurrency=pool_size())

    def within(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy()
        m = np.stack(g["unit"].to_numpy())
        sims = m @ m.T
        ia, ib = np.where(np.triu(sims >= threshold, k=1))
        return pd.DataFrame(
            {
                "vec_a": np.minimum(ids[ia], ids[ib]).astype(np.int64),
                "vec_b": np.maximum(ids[ia], ids[ib]).astype(np.int64),
                "cosine": sims[ia, ib].astype(np.float64),
            }
        )

    res = buckets.groupby(["table", "bucket"]).map_groups(within, batch_format="pandas").to_pandas()
    if len(res) == 0 or "vec_a" not in res.columns:
        return pa.table(
            {
                "vec_a": pa.array([], type=pa.int64()),
                "vec_b": pa.array([], type=pa.int64()),
                "cosine": pa.array([], type=pa.float64()),
            }
        )
    res = res.drop_duplicates(subset=["vec_a", "vec_b"]).sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(res.astype({"vec_a": "int64", "vec_b": "int64", "cosine": "float64"}))
