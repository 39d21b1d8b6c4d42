"""Interleaved FSST kernel A/B over real corpus bytes (single core).

Reproduces the BENCH.md round-5 addendum 2/4 kernel measurements:
the pyarrow binary replace chain (landed default) vs the bytes.replace
fallback (bit-identical, asserted) vs the opt-in hybrid AC-tail split,
plus the Arrow-take decode.  Interleaved
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

    import os

    def encode_with(k: int, arrow: bool) -> tuple[float, bytes]:
        table._CHAIN_K = k
        table._ac = None
        if arrow:
            os.environ.pop("SKAR_FSST_NO_ARROW", None)
        else:
            os.environ["SKAR_FSST_NO_ARROW"] = "1"
        t0 = time.perf_counter()
        enc = table.encode_buffer(data)
        return time.perf_counter() - t0, enc

    for rep in range(args.reps):
        dt_a, enc_a = encode_with(10_000, arrow=True)   # arrow binary chain
        dt_b, enc_b = encode_with(10_000, arrow=False)  # bytes.replace chain
        dt_h, enc_h = encode_with(12, arrow=False)      # opt-in hybrid (AC tail)
        t0 = time.perf_counter()
        dec = table.decode_buffer(enc_a)
        dt_d = time.perf_counter() - t0
        assert enc_a == enc_b and dec == data and table.decode_buffer(enc_h) == data
        za = len(zc.compress(enc_a).to_pybytes()) / n
        zh = len(zc.compress(enc_h).to_pybytes()) / n
        print(
            f"rep{rep}: arrow-chain {n/dt_a/1e6:5.1f} MB/s | bytes-chain "
            f"{n/dt_b/1e6:5.1f} MB/s (both post-zstd {za:.4f}) | hybrid K=12 "
            f"{n/dt_h/1e6:5.1f} MB/s (post-zstd {zh:.4f}) | decode {n/dt_d/1e6:.0f} MB/s out"
        )
    os.environ.pop("SKAR_FSST_NO_ARROW", None)
    table._CHAIN_K = type(table)._CHAIN_K  # restore class default


if __name__ == "__main__":
    main()
