"""Interleaved FSST kernel A/B over real corpus bytes (single core).

Reproduces the BENCH.md round-5 "addendum 2" measurements: hybrid
encode (top-K replace chain + one Aho-Corasick tail) vs the pure
replace chain, and the Arrow-take decode vs output size.  Interleaved
reps make the ranking immune to this host's throttle phases; ratios
are phase-independent.

    python tools/fsst_kernel_ab.py [--mb 32] [--rows 20000]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from skar_ray.codecs import base
from skar_ray.codecs.fsst import FsstCodec
from skar_ray.corpus import ensure_corpus


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=32)
    ap.add_argument("--rows", type=int, default=20_000)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    d = ensure_corpus(args.rows)
    t = pq.read_table(f"{d}/corpus.parquet", columns=["content"])
    _, data = base.strings_to_buffers(t.column("content").combine_chunks())
    data = data[: args.mb << 20]
    n = len(data)
    zc = pa.Codec("zstd", compression_level=9)

    table = FsstCodec().make_table(data)
    print(f"{n/1e6:.1f} MB, {len(table.symbols)} symbols, chain {len(table._multi)}")
    table.encode_buffer(data[: 1 << 20])  # warm polars import + thread pool

    def encode_with_k(k: int) -> tuple[float, bytes]:
        table._CHAIN_K = k
        table._ac = None
        t0 = time.perf_counter()
        enc = table.encode_buffer(data)
        return time.perf_counter() - t0, enc

    for rep in range(args.reps):
        dt_h, enc_h = encode_with_k(12)
        dt_c, enc_c = encode_with_k(10_000)  # pure chain
        t0 = time.perf_counter()
        dec = table.decode_buffer(enc_h)
        dt_d = time.perf_counter() - t0
        assert dec == data and table.decode_buffer(enc_c) == data
        zh = len(zc.compress(enc_h).to_pybytes()) / n
        zecc = len(zc.compress(enc_c).to_pybytes()) / n
        print(
            f"rep{rep}: hybrid {n/dt_h/1e6:5.1f} MB/s (post-zstd {zh:.4f}) | "
            f"chain {n/dt_c/1e6:5.1f} MB/s (post-zstd {zecc:.4f}) | "
            f"speedup {dt_c/dt_h:.2f}x | decode {n/dt_d/1e6:.0f} MB/s out"
        )
    table._CHAIN_K = type(table)._CHAIN_K  # restore class default


if __name__ == "__main__":
    main()
