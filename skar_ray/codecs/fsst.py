"""FSST-style static-symbol-table codec for string/binary columns.

Built from scratch following the published FSST idea (Boncz, Neumann,
Leis: "FSST: Fast Random Access String Compression", VLDB 2020): a
small table of byte-sequence symbols (1..8 bytes) is trained per
partition on a sample, and the column's value bytes are rewritten as
1-byte codes.  This replaces the generic page compression the reference
relies on (Plain encoding + Zstd(9) pages,
/root/reference/skar/src/write_parquet.rs:49-53,232-244) with a
column-aware lightweight scheme; the container's zstd page pass can
still run on top of the code stream.

Code-space layout (chosen so ASCII text needs no escapes):
- ``0x00..0x7F``  — literal passthrough: the code IS the byte.
- ``0x80..0xFE``  — up to 127 learned symbols.
- ``0xFF``        — escape: next byte is a literal ``>= 0x80`` byte
                    that is not covered by a learned symbol.

Because the whole concatenated value buffer is encoded in one pass
(symbols may span row boundaries — decode restores the exact byte
stream), row boundaries are carried by the original lengths,
FoR+bit-packed separately.  Training is vectorised (sliding-window
``np.unique`` n-gram counting); encoding is a ``bytes.replace`` chain
over cache-resident pieces (optionally hybridised with one
Aho-Corasick tail scan via ``SKAR_FSST_CHAIN_K`` — see ``_CHAIN_K``);
decoding is one Arrow binary take per escape-free segment.
"""

from __future__ import annotations

import os

# The AC tail pass runs inside Ray workers that already saturate the
# node one-core-per-worker; polars' default pool (all cores) would
# oversubscribe 32×32 threads.  Must be set before polars' first import
# in the process — encode_buffer imports it lazily, after this module.
os.environ.setdefault("POLARS_MAX_THREADS", "1")

import numpy as np
import pyarrow as pa

from . import base
from .for_bitpack import pack_ints_with_reference, unpack_ints_with_reference

MAX_SYMBOLS = 127
FIRST_CODE = 0x80
ESCAPE = 0xFF
# training window cap: 16 measured best on the code corpus — longer
# symbols save more bytes per replace AND shrink the buffer faster
# (ratio 0.384→0.377, encode 11→13 MB/s/core vs 8); past 16 the ratio
# plateaus while the decode gather matrix widens (45→26 MB/s)
_MAX_LEN = 16


def _window_counts(w: np.ndarray, L: int) -> tuple[np.ndarray, np.ndarray]:
    """(first_index, count) per distinct window row — integer-keyed
    grouping instead of an L-byte void view: the int sort is ~10×
    faster than void lexicographic compares (measured 0.035 s → 0.004 s
    per length on the 128 KiB training sample).  L ≤ 8 packs the bytes
    losslessly into one uint64 key; 8 < L ≤ 16 packs into TWO uint64
    words and groups via a stable two-key lexsort — still exact (a
    prior FNV rolling hash here had ~1e-9 collision odds that could
    merge two windows' counts; this keeps the speed without the odds)."""
    if L <= 8:
        pad = np.zeros((len(w), 8), dtype=np.uint8)
        pad[:, :L] = w
        key = pad.view(np.uint64).ravel()
        _, idx, counts = np.unique(key, return_index=True, return_counts=True)
        return idx, counts
    if L > 16:
        raise ValueError(f"window length {L} > 16 unsupported")
    pad = np.zeros((len(w), 16), dtype=np.uint8)
    pad[:, :L] = w
    k = pad.view(np.uint64).reshape(-1, 2)
    k1, k2 = k[:, 0], k[:, 1]
    order = np.lexsort((k2, k1))  # stable: first index per group survives
    s1, s2 = k1[order], k2[order]
    new = np.empty(len(order), dtype=bool)
    new[0] = True
    new[1:] = (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])
    starts = np.flatnonzero(new)
    counts = np.diff(np.append(starts, len(order)))
    # lexsort is stable, but ties keep ORIGINAL order only within equal
    # (k1,k2) groups — order[starts] is the group's lowest original
    # index, matching np.unique(return_index=True) semantics
    idx = order[starts]
    return idx, counts


def train_symbols(sample: bytes, max_symbols: int = MAX_SYMBOLS) -> list[bytes]:
    """Pick up to `max_symbols` byte sequences maximising estimated savings.

    Multi-byte symbols are restricted to ASCII (<0x80) bytes: the fast
    encoder's ``bytes.replace`` chain relies on inserted code bytes
    (≥0x80) never being part of a later symbol match.  Single-byte
    symbols are allowed for frequent high bytes (saves their escape).
    """
    if len(sample) < 4:
        return []
    buf = np.frombuffer(sample, dtype=np.uint8)
    candidates: list[tuple[int, bytes]] = []
    # frequent high bytes: encoding one as a symbol saves the escape byte
    hi_vals, hi_counts = np.unique(buf[buf >= 0x80], return_counts=True)
    for v, c in zip(hi_vals.tolist(), hi_counts.tolist()):
        if c >= 4:
            candidates.append((c, bytes([v])))
    for L in range(2, _MAX_LEN + 1):
        if len(buf) <= L:
            break
        win = np.lib.stride_tricks.sliding_window_view(buf, L)
        # subsample long windows for speed: scan <= ~512K windows per length
        step = max(1, len(win) // (1 << 19))
        win = win[::step]
        ascii_only = (win < 0x80).all(axis=1)
        win = np.ascontiguousarray(win[ascii_only])
        if len(win) == 0:
            continue
        idx, counts = _window_counts(win, L)
        if len(counts) == 0:
            continue
        # O(n) top-256 instead of a full argsort over up to 512K
        # uniques (candidate tie order at the cut may differ — both
        # orders are deterministic, and refine_symbols re-validates
        # every survivor's realized gain anyway)
        if len(counts) > 256:
            part = np.argpartition(counts, -256)[-256:]
            top = part[np.argsort(counts[part])[::-1]]
        else:
            top = np.argsort(counts)[::-1]
        for i in top:
            c = int(counts[i]) * step
            if c < 4:
                break
            candidates.append((c * (L - 1), win[idx[i]].tobytes()))
    candidates.sort(key=lambda t: (-t[0], t[1]))
    out: list[bytes] = []
    seen: set[bytes] = set()
    for _, sym in candidates:
        if sym in seen:
            continue
        seen.add(sym)
        out.append(sym)
        if len(out) >= max_symbols:
            break
    return out


def refine_symbols(
    symbols: list[bytes], sample: bytes, max_loss_frac: float = 0.01
) -> tuple[list[bytes], list[bytes]]:
    """Second training generation ("iterative re-counting"): simulate
    the encode chain on the sample to measure each symbol's REALIZED
    savings — greedy n-gram counting overcounts overlapping candidates
    (" the" / "the " / "he t" all claim the same bytes), so many of the
    127 selected symbols realize almost nothing yet still cost one
    C-scan ``bytes.replace`` pass per 64 KiB piece at encode time.

    Returns ``(kept_symbols, chain_order)``:
    - drops the lowest-gain tail whose TOTAL realized savings is under
      ``max_loss_frac`` of the sample (bounded size impact; dropped
      matches are partially recaptured by surviving shorter symbols).
      Default 0.01: each surviving symbol costs one C-scan per piece at
      encode time, and the measured sweep (BENCH.md r4) shows 0.002→
      0.01 cuts the chain 49→43 passes for 18% faster encode at +1.6%
      encoded bytes — cheap against the 5.3× compression headroom;
    - orders the remaining chain by realized gain (descending) subject
      to superstring-before-substring, so the highest-gain passes
      shrink the buffer before low-gain passes scan it.
    """
    if not symbols or len(sample) < 4:
        return symbols, [s for s in symbols if len(s) > 1]
    t = SymbolTable(symbols)
    arr = np.frombuffer(sample, dtype=np.uint8)
    gains: dict[bytes, int] = {}
    for s in symbols:
        if len(s) == 1 and s[0] >= 0x80:
            gains[s] = int(np.count_nonzero(arr == s[0]))  # escape byte saved
    if arr.max() >= 0x80:
        data = _escape_splice(t._hi_lut[arr], np.flatnonzero(t._needs_escape[arr]))
    else:
        data = sample
    for sym, code in t._multi:  # longest-first simulation, counting matches
        c = data.count(sym)
        gains[sym] = c * (len(sym) - 1)
        data = data.replace(sym, code)
    # drop the tail: cheapest symbols first until the loss budget is spent
    budget = int(len(sample) * max_loss_frac)
    dropped: set[bytes] = set()
    acc = 0
    for s in sorted(symbols, key=lambda s: gains.get(s, 0)):
        g = gains.get(s, 0)
        if acc + g > budget:
            break
        acc += g
        dropped.add(s)
    kept = [s for s in symbols if s not in dropped]
    # gain-desc chain order with the superstring-before-substring
    # constraint (if B ⊂ A and B ran first, A would never match)
    multi = [s for s in kept if len(s) > 1]
    remaining = sorted(multi, key=lambda s: -gains.get(s, 0))
    chain: list[bytes] = []
    placed: set[bytes] = set()
    while remaining:
        progressed = False
        deferred = []
        for s in remaining:
            blockers = [o for o in remaining if o is not s and len(o) > len(s) and s in o]
            if any(o not in placed for o in blockers):
                deferred.append(s)
                continue
            chain.append(s)
            placed.add(s)
            progressed = True
        remaining = deferred
        if not progressed:  # cycle impossible (strict length order), but stay safe
            chain.extend(remaining)
            break
    return kept, chain


_ESC_BYTES = bytes((ESCAPE,))


def _escape_splice(mapped: np.ndarray, idx: np.ndarray) -> bytes:
    """Insert an ESCAPE marker before every byte at position ``idx``.

    Escapes are RARE on ASCII-dominated corpora (measured 6e-7 of
    content bytes), so the hot path is slice-and-join around each
    marker — one buffer copy plus O(n_esc) Python slices (~0.03 s vs
    np.insert's 0.28 s full masked copy on a 30 MB column).  Above
    ~0.1% density the per-escape Python cost crosses over and
    np.insert's vectorised path wins."""
    if idx.size == 0:
        return mapped.tobytes()
    if idx.size > max(1024, len(mapped) >> 10):
        return np.insert(mapped, idx, ESCAPE).tobytes()
    mb = mapped.tobytes()
    parts = []
    prev = 0
    for p in idx.tolist():
        parts.append(mb[prev:p])
        parts.append(_ESC_BYTES)
        prev = p
    parts.append(mb[prev:])
    return b"".join(parts)


class SymbolTable:
    def __init__(self, symbols: list[bytes], chain: list[bytes] | None = None):
        self.symbols = symbols
        self.code_of = {s: FIRST_CODE + i for i, s in enumerate(symbols)}
        # encoder fast path: multi-byte ASCII symbols applied as a
        # bytes.replace chain (a replace can never match across an
        # inserted code byte since codes are >= 0x80 and symbols are
        # pure ASCII — so ANY chain order is bit-exact; order only
        # affects ratio/speed); high single bytes mapped via LUT.
        # Default order longest-first (a symbol's superstrings must run
        # before it or they never match); ``chain`` overrides with a
        # trained order (realized-gain-first, substring-constrained —
        # high-gain passes shrink the buffer before low-gain passes
        # scan it, see refine_symbols).
        if chain is None:
            chain = sorted((s for s in symbols if len(s) > 1), key=len, reverse=True)
        self._multi = [(s, bytes((self.code_of[s],))) for s in chain if len(s) > 1]
        self._ac = None  # lazily-built polars Aho-Corasick tail (encode only)
        self._hi_lut = np.arange(256, dtype=np.uint8)
        self._needs_escape = np.zeros(256, dtype=bool)
        self._needs_escape[0x80:] = True
        self._hi_identity = True
        for i, s in enumerate(symbols):
            if len(s) == 1 and s[0] >= 0x80:
                self._hi_lut[s[0]] = FIRST_CODE + i
                self._needs_escape[s[0]] = False
                self._hi_identity = False
        # decode table: a 256-entry variable-length binary Arrow array,
        # code -> symbol bytes.  ``pc.take(sym_arr, codes)`` materializes
        # the concatenated expansion directly in its value buffer (an
        # Arrow BinaryArray's data buffer IS its values in order), so
        # decode touches exactly output-size bytes — measured 4.4×
        # faster than the prior padded mask-gather, whose cost scaled
        # with the LONGEST symbol width (BENCH.md r5 addendum 2).
        expand = [bytes((b,)) for b in range(0x80)] + [b""] * 128
        for i, s in enumerate(symbols):
            expand[FIRST_CODE + i] = s
        self._sym_arr = pa.array(expand, type=pa.binary())

    def serialize(self) -> bytes:
        return base.pack_sections(*self.symbols) if self.symbols else base.pack_sections()

    @classmethod
    def deserialize(cls, blob: bytes) -> "SymbolTable":
        return cls(base.unpack_sections(blob))

    # ------------------------------------------------------------ encode

    # cache-resident piece for the replace chain; env-overridable for
    # the scaling-contention experiments recorded in BENCH.md (the
    # replace chain is the encode's DRAM-heaviest window — piece size
    # trades L1/L2 residency against per-piece chain overhead)
    _PIECE = int(os.environ.get("SKAR_FSST_PIECE", 64 << 10))
    # pieces per polars Series group (bytes): the chain runs start-to-
    # finish within each group so the working set stays cache-resident
    # at many workers, while grouping amortizes the per-call overhead
    _GROUP = int(os.environ.get("SKAR_FSST_GROUP", 256 << 10))
    # hybrid split (OPT-IN): the top-K realized-gain symbols run as
    # bytes.replace passes; the rest apply in ONE Aho-Corasick scan
    # (polars str.replace_many, Rust) over the Series of pieces.  The AC
    # pass uses aho-corasick *standard* (earliest-end) match semantics,
    # under which short symbols preempt longer overlapping ones — so it
    # cannot carry the HIGH-gain long symbols (measured: pure-AC ratio
    # 0.423 vs chain 0.370) but applies the low-gain tail cheaply.
    # Single-core A/B (tools/fsst_kernel_ab.py): K=12 → 1.7× faster at
    # +1.0% post-zstd; K beyond 12 buys NO bytes back (the +1% is
    # earliest-end semantics, not split position).  At JOB level on 32
    # workers, though, the pure chain is equal-or-faster AND 2.2%
    # smaller (interleaved sf0.1 A/B, BENCH.md r5 addendum 3), so the
    # DEFAULT is the pure chain; set SKAR_FSST_CHAIN_K=12 to trade ~2%
    # footprint for single-core encode speed (e.g. few-worker callers).
    _CHAIN_K = int(os.environ.get("SKAR_FSST_CHAIN_K", 1 << 30))

    def _ac_tail(self):
        """(patterns, replacements) for the AC tail pass, built once.

        Falls back to None (pure chain) when polars is unavailable.
        Patterns are latin-1-decoded so one byte == one char: symbols
        are pure ASCII and replacement codes 0x80..0xFE are valid
        single chars, and the scan's input already carries code bytes
        (>= 0x80) that no ASCII pattern can span — the same safety
        argument as the chain, minus re-scanning (AC never re-scans
        its own replacements)."""
        if self._ac is None:
            tail = self._multi[self._CHAIN_K :]
            if not tail:
                self._ac = ()
            else:
                try:  # tables ship through Ray: cache strings, not modules
                    import polars  # noqa: F401  baked-in dependency; guarded anyway
                except ImportError:  # pragma: no cover - polars is baked in
                    self._ac = ()
                    return self._ac
                self._ac = (
                    [s.decode("latin-1") for s, _ in tail],
                    [c.decode("latin-1") for _, c in tail],
                )
        return self._ac

    def encode_buffer(self, data: bytes) -> bytes:
        """Three passes, no per-match Python:
        1. vectorised high-byte pass — map single-byte high symbols to
           their codes (LUT) and splice escape markers before the rest;
        2. the gain-ordered replace chain over ~64 KiB pieces so the
           passes stay L2-resident — on a whole multi-MB buffer the
           chain is memory-bandwidth-bound and parallel workers fight
           for DRAM (measured 2× faster per core, near-linear at 32
           workers; flat 16 KiB–1 MiB, 2× collapse at 16 MiB).  A
           symbol spanning a piece boundary is simply left literal —
           bit-exact either way, ratio loss < 0.1%.  Each pass is one
           ``pc.replace_substring`` over a binary array of a ~256 KiB
           group of pieces — measured 1.37× the ``bytes.replace`` loop
           with BIT-IDENTICAL output (same leftmost non-overlapping
           scan; the fallback loop below is pinned equal by
           ``test_arrow_chain_matches_bytes_replace``);
        3. (opt-in, ``SKAR_FSST_CHAIN_K``) one Aho-Corasick scan
           (``str.replace_many``) applying the tail symbols on the same
           Series (see ``_ac_tail`` for semantics and safety)."""
        if not data:
            return data
        arr = np.frombuffer(data, dtype=np.uint8)
        if self._hi_identity:
            # no high single-byte symbols -> the LUT is identity; skip
            # the 30 MB gather and escape every high byte in place
            hi = np.flatnonzero(arr >= 0x80)
            if hi.size:
                data = _escape_splice(arr, hi)
        elif arr.max() >= 0x80:
            data = _escape_splice(
                self._hi_lut[arr], np.flatnonzero(self._needs_escape[arr])
            )
        ac = self._ac_tail()
        multi = self._multi if not ac else self._multi[: self._CHAIN_K]
        pieces = (
            [data]
            if len(data) <= self._PIECE
            else [data[s : s + self._PIECE] for s in range(0, len(data), self._PIECE)]
        )
        if multi and not os.environ.get("SKAR_FSST_NO_ARROW"):
            # pyarrow binary replace chain: byte patterns on binary
            # arrays — no latin-1/UTF-8 conversion anywhere (a polars
            # str chain was tried first and LOST at job level: code
            # bytes >= 0x80 are 2-byte UTF-8 in its string buffers, so
            # the working set doubles as encoding progresses — 1.3×
            # faster single-core, 1.5× slower at 32 workers).  The
            # chain runs start-to-finish within each ~256 KiB group of
            # pieces so the working set stays cache-resident at many
            # workers; one pass over ALL pieces per symbol would be a
            # full-buffer DRAM sweep per pass (measured 1.4× slower
            # even single-core).
            import pyarrow.compute as _pc

            grp = max(1, self._GROUP // self._PIECE)
            parts = []
            for g in range(0, len(pieces), grp):
                arr = pa.array(pieces[g : g + grp], type=pa.binary())
                for sym, code in multi:
                    arr = _pc.replace_substring(arr, pattern=sym, replacement=code)
                if ac:
                    import polars as pl

                    s = pl.Series([x.decode("latin-1") for x in arr.to_pylist()])
                    parts.extend(x.encode("latin-1") for x in s.str.replace_many(*ac))
                else:
                    # the data buffer IS the concatenated values; slice
                    # by the logical offsets (buffers may carry padding
                    # past the last offset, so index by array length)
                    offs = np.frombuffer(arr.buffers()[1], np.int32)
                    lo = int(offs[arr.offset])
                    hi = int(offs[arr.offset + len(arr)])
                    parts.append(memoryview(arr.buffers()[2])[lo:hi].tobytes())
            return b"".join(parts)
        for i, piece in enumerate(pieces):
            for sym, code in multi:
                piece = piece.replace(sym, code)
            pieces[i] = piece
        if ac:
            import polars as pl

            pats, reps = ac
            done = pl.Series([p.decode("latin-1") for p in pieces]).str.replace_many(
                pats, reps
            )
            return b"".join(s.encode("latin-1") for s in done)
        return b"".join(pieces) if len(pieces) > 1 else pieces[0]

    # ------------------------------------------------------------ decode

    def _expand(self, codes: np.ndarray) -> bytes:
        """Vectorised expansion of an escape-free code segment via one
        Arrow take (see ``__init__``).  Chunked only to bound the int32
        offsets buffer of the take result (4 bytes/code)."""
        if len(codes) == 0:
            return b""
        import pyarrow.compute as pc

        out = []
        CH = 1 << 22  # 4M codes/chunk -> 16 MB offsets temp
        for s in range(0, len(codes), CH):
            taken = pc.take(self._sym_arr, pa.array(codes[s : s + CH]))
            offs = np.frombuffer(taken.buffers()[1], np.int32)
            lo = int(offs[taken.offset])
            hi = int(offs[taken.offset + len(taken)])
            out.append(memoryview(taken.buffers()[2])[lo:hi].tobytes())
        return b"".join(out)

    def decode_buffer(self, enc: bytes) -> bytes:
        codes = np.frombuffer(enc, dtype=np.uint8)
        cand = np.flatnonzero(codes == ESCAPE)
        if len(cand) == 0:
            return self._expand(codes)
        # sequential scan over escape candidates (rare): a candidate at p
        # is a real marker unless it is the literal of the marker at p-1
        markers = []
        skip_until = -1
        for p in cand.tolist():
            if p < skip_until:
                continue
            markers.append(p)
            skip_until = p + 2
        parts = []
        prev = 0
        for p in markers:
            parts.append(self._expand(codes[prev:p]))
            parts.append(enc[p + 1 : p + 2])  # the escaped literal byte
            prev = p + 2
        parts.append(self._expand(codes[prev:]))
        return b"".join(parts)


class FsstCodec:
    name = "fsst"

    # 64 KiB sampled as 16 stride pieces: swept 32/48/64/128 KiB × 8/16/32
    # pieces on three 11 MB corpus partitions (BENCH.md r5 addendum 2) —
    # 64 KiB/16 trains 2× faster than the prior 128 KiB at equal-or-better
    # ratio (payload 0.394 vs 0.405, post-zstd 0.0453 vs 0.0455)
    def __init__(self, sample_bytes: int = 1 << 16):
        self.sample_bytes = sample_bytes

    def can_encode(self, t: pa.DataType) -> bool:
        return base.is_string_like(t)

    def make_table(self, data: bytes) -> SymbolTable:
        if len(data) > self.sample_bytes:
            # stride-sample contiguous slices across the buffer
            k = 16
            piece = self.sample_bytes // k
            stride = len(data) // k
            sample = b"".join(data[i * stride : i * stride + piece] for i in range(k))
        else:
            sample = data
        syms = train_symbols(sample)
        kept, chain = refine_symbols(syms, sample)
        return SymbolTable(kept, chain=chain)

    def encode(self, arr: pa.Array, table: SymbolTable | None = None) -> tuple[bytes, dict]:
        nulls, filled = base.split_nulls(arr)
        lengths, data = base.strings_to_buffers(filled)
        if table is None:
            table = self.make_table(data)
        enc = table.encode_buffer(data)
        lens_payload, lens_meta = pack_ints_with_reference(lengths)
        meta = {
            "lens_meta": lens_meta,
            "n_syms": len(table.symbols),
            "has_nulls": nulls is not None,
        }
        payload = base.pack_sections(nulls or b"", lens_payload, table.serialize(), enc)
        return payload, meta

    def decode(self, payload: bytes, meta: dict, n: int) -> pa.Array:
        t = base.type_from_name(meta["type"])
        nulls_b, lens_payload, table_blob, enc = base.unpack_sections(payload)
        table = SymbolTable.deserialize(table_blob)
        lengths = unpack_ints_with_reference(lens_payload, meta["lens_meta"], n)
        data = table.decode_buffer(enc)
        arr = base.strings_from_buffers(lengths.astype(np.int64), data, t)
        return base.apply_nulls(arr, nulls_b if meta.get("has_nulls") else None, n)


base.register(FsstCodec())
