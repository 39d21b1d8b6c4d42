"""Shared pruning predicate logic for manifests (partition level) and
container chunk stats (row-group level) — skar's prune_query /
row-group-skip logic (/root/reference/skar/src/query/handler.rs:187-250,
data_provider.rs:250-333), conservative: unknown stats ⇒ possible."""

from __future__ import annotations


def clause_possible(st: dict, op: str, value) -> bool:
    distinct = st.get("distinct")
    lo, hi = st.get("min"), st.get("max")
    if op in ("==", "in"):
        vals = value if op == "in" else [value]
        if distinct is not None:
            return any(v in distinct for v in vals)
        if st.get("bloom"):
            from .bloom import SplitBlockBloom

            bf = SplitBlockBloom.deserialize(st["bloom"])
            return any(bf.might_contain(str(v).encode()) for v in vals)
        if lo is not None:
            return any(lo <= str(v) <= hi for v in vals)
        return True
    if op == "prefix" and lo is not None:
        v = str(value)
        return lo[: len(v)] <= v <= hi[: len(v)]
    if lo is None:
        return True
    v = str(value)
    if op in (">=", ">"):
        return hi >= v if op == ">=" else hi > v
    if op in ("<=", "<"):
        return lo <= v if op == "<=" else lo < v
    return True  # != and unknown ops never prune


def dnf_possible(stats_of_col, dnf) -> bool:
    """`stats_of_col(name) -> dict`; True if any disjunct might match."""
    if not dnf:
        return True
    return any(
        all(clause_possible(stats_of_col(c) or {}, op, v) for c, op, v in conj) for conj in dnf
    )
