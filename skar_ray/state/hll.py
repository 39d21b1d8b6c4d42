"""HyperLogLog sketch — mergeable approximate distinct count.

The scalable pattern for distinct-cardinality at 100 TB: one sketch per
batch inside ``map_batches`` (vectorised register update), merged in a
tiny reduce — sketches are designed to be mergeable, so the shuffle
moves KBs instead of the value universe.  Complements the exact
distinct sets the manifest stores for small cardinalities (the
reference's BTreeSet distinct + bloom pair,
/root/reference/skar/src/build_parquet_idx.rs:89-115).

Standard dense HLL (Flajolet et al.), p-bit register index, blake2b
hashing, linear-counting small-range correction.
"""

from __future__ import annotations

import hashlib

import numpy as np


class HyperLogLog:
    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.registers = registers if registers is not None else np.zeros(self.m, dtype=np.uint8)

    def add_many(self, values: list[bytes]) -> None:
        if not values:
            return
        h = np.array(
            [int.from_bytes(hashlib.blake2b(v, digest_size=8).digest(), "big") for v in values],
            dtype=np.uint64,
        )
        self._update(h)

    def add_ints(self, values: "np.ndarray") -> None:
        """Vectorised integer path: splitmix64 finalizer (public
        constant-avalanche mix) instead of a per-value blake2b Python
        loop — same register semantics, no per-row Python."""
        if len(values) == 0:
            return
        v = np.asarray(values).astype(np.uint64)
        v = (v ^ (v >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        v = (v ^ (v >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        v ^= v >> np.uint64(31)
        self._update(v)

    def _update(self, h: "np.ndarray") -> None:
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = (#leading zeros of `rest`) + 1 — binary-search shifts,
        # fully vectorised, exact (no float log2 rounding hazards)
        rank = np.ones(len(rest), dtype=np.uint8)
        v = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            s = np.uint64(shift)
            no_high = v < (np.uint64(1) << np.uint64(64 - shift))
            rank[no_high] += shift
            v = np.where(no_high, v << s, v)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        return HyperLogLog(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        zeros = int(np.count_nonzero(self.registers == 0))
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # linear counting
        return float(est)

    def serialize(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def deserialize(cls, raw: bytes) -> "HyperLogLog":
        return cls(raw[0], np.frombuffer(raw[1:], dtype=np.uint8).copy())
