"""Split-block Bloom filter (SBBF) — the reference's per-folder index
sketch, re-implemented from the public Parquet SBBF design.

skar builds SBBFs over the distinct address/topic sets of every folder
and row group and consults them to prune queries
(/root/reference/skar/src/build_parquet_idx.rs:96-189, query pruning
handler.rs:187-250; serialization db/bloom_filter.rs:12-48).  Ours
sketches the distinct values of high-cardinality string columns (e.g.
``path``, ``commit``) per partition — the exact `distinct` list in the
manifest covers low-cardinality columns, the SBBF covers the rest.

Layout: ``nblocks`` blocks of 8×uint32 words (256 bits).  A value
hashes to one block; 8 bits — one per word, position from 8 salted
sub-hashes — are set (the standard SBBF scheme).  Pure numpy; the
serialized form is hex-encoded for JSON manifests.
"""

from __future__ import annotations

import hashlib

import numpy as np

_SALTS = np.array(
    [0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
     0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5C6BFB31],
    dtype=np.uint64,
)


def _hash64(values: list[bytes]) -> np.ndarray:
    return np.array(
        [int.from_bytes(hashlib.blake2b(v, digest_size=8).digest(), "little") for v in values],
        dtype=np.uint64,
    )


def _positions(h: np.ndarray, nblocks: int) -> tuple[np.ndarray, np.ndarray]:
    """(block index, 8 per-word bit masks) for each hash — shared by
    build and probe so the bit scheme can never diverge."""
    block_idx = (h % np.uint64(nblocks)).astype(np.int64)
    key = (h >> np.uint64(32)).astype(np.uint64)
    # 8 bit positions, one per word: (key * salt) >> 27 gives 0..31
    bitpos = ((key[:, None] * _SALTS[None, :]) & np.uint64(0xFFFFFFFF)) >> np.uint64(27)
    masks = (np.uint32(1) << bitpos.astype(np.uint32)).astype(np.uint32)
    return block_idx, masks


class SplitBlockBloom:
    def __init__(self, blocks: np.ndarray):
        self.blocks = blocks  # (nblocks, 8) uint32

    @classmethod
    def build(cls, values: list[bytes], bits_per_value: int = 16) -> "SplitBlockBloom":
        h = _hash64(values) if values else np.array([], dtype=np.uint64)
        return cls.build_from_hashes(h, bits_per_value=bits_per_value)

    @classmethod
    def build_from_hashes(
        cls, h: np.ndarray, bits_per_value: int = 16
    ) -> "SplitBlockBloom":
        """Build from precomputed uint64 hashes — the vectorised path
        for operator-level sketches (callers hash with whatever fast
        64-bit hash they probe with, e.g. pd.util.hash_array)."""
        n = max(1, len(h))
        nblocks = max(1, (n * bits_per_value + 255) // 256)
        blocks = np.zeros((nblocks, 8), dtype=np.uint32)
        if len(h):
            block_idx, masks = _positions(h.astype(np.uint64), nblocks)
            for w in range(8):
                np.bitwise_or.at(blocks[:, w], block_idx, masks[:, w])
        return cls(blocks)

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        """Vectorised membership probe for precomputed uint64 hashes
        (pairs with build_from_hashes)."""
        if len(h) == 0:
            return np.zeros(0, dtype=bool)
        block_idx, masks = _positions(h.astype(np.uint64), len(self.blocks))
        return ((self.blocks[block_idx] & masks) == masks).all(axis=1)

    def might_contain(self, value: bytes) -> bool:
        h = _hash64([value])[0]
        bi = int(h % np.uint64(len(self.blocks)))
        key = np.uint64(int(h) >> 32)
        bitpos = ((key * _SALTS) & np.uint64(0xFFFFFFFF)) >> np.uint64(27)
        masks = (np.uint32(1) << bitpos.astype(np.uint32)).astype(np.uint32)
        return bool(np.all((self.blocks[bi] & masks) == masks))

    def serialize(self) -> str:
        return self.blocks.tobytes().hex()

    @classmethod
    def deserialize(cls, hexstr: str) -> "SplitBlockBloom":
        raw = bytes.fromhex(hexstr)
        arr = np.frombuffer(raw, dtype=np.uint32).reshape(-1, 8).copy()
        return cls(arr)
