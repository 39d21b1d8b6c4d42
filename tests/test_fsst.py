"""FSST symbol-table specifics: training, escapes, buffer round-trips."""

import numpy as np
import pyarrow as pa

from skar_ray.codecs.fsst import FsstCodec, SymbolTable, train_symbols, ESCAPE


def test_train_learns_repeated_tokens():
    sample = b"def return def return import numpy as np " * 200
    syms = train_symbols(sample)
    assert syms, "should learn symbols from repetitive text"
    assert any(len(s) >= 4 for s in syms)


def test_encode_shrinks_code_text():
    data = b"for i in range(n):\n    total += values[i]\n" * 500
    t = SymbolTable(train_symbols(data))
    enc = t.encode_buffer(data)
    assert len(enc) < len(data) * 0.6
    assert t.decode_buffer(enc) == data


def test_high_bytes_escape_roundtrip():
    # bytes >= 0x80 not learned as symbols must escape cleanly
    data = bytes(range(256)) * 3 + b"\xff\xff\xff" + b"ascii tail"
    t = SymbolTable(train_symbols(b"no high bytes here at all, plain ascii text"))
    enc = t.encode_buffer(data)
    assert t.decode_buffer(enc) == data


def test_escape_literal_is_escape_byte():
    t = SymbolTable([])
    data = b"\xff" * 10 + b"a\xffb"
    enc = t.encode_buffer(data)
    assert enc.count(bytes([ESCAPE])) >= 11
    assert t.decode_buffer(enc) == data


def test_empty_and_tiny():
    t = SymbolTable([])
    assert t.decode_buffer(t.encode_buffer(b"")) == b""
    assert t.decode_buffer(t.encode_buffer(b"a")) == b"a"


def test_serialize_roundtrip():
    syms = train_symbols(b"token stream token stream token" * 100)
    t = SymbolTable(syms)
    t2 = SymbolTable.deserialize(t.serialize())
    data = b"token stream and more token stream"
    assert t2.decode_buffer(t.encode_buffer(data)) == data


def test_symbols_spanning_row_boundaries():
    """Whole-buffer encoding means symbols may cross row boundaries;
    original lengths must still slice the decoded buffer correctly."""
    codec = FsstCodec()
    rows = ["abcdef"] * 100 + ["defabc"] * 100  # 'fabc'/'cdef' span rows when concatenated
    arr = pa.array(rows)
    payload, meta = codec.encode(arr)
    meta["type"] = str(arr.type)
    meta["n"] = len(arr)
    out = codec.decode(payload, meta, len(arr))
    assert out.equals(arr)


def test_unicode_content():
    codec = FsstCodec()
    arr = pa.array(["λ calculus → Ω" * 50, "漢字テキスト" * 30, "plain ascii"] * 10)
    payload, meta = codec.encode(arr)
    meta["type"] = str(arr.type)
    meta["n"] = len(arr)
    assert codec.decode(payload, meta, len(arr)).equals(arr)


def test_decode_vectorized_matches_naive():
    syms = train_symbols(b"the quick brown fox jumps over the lazy dog " * 50)
    t = SymbolTable(syms)
    data = b"the quick brown fox " * 37 + bytes([0x80, 0x81, 0xFF]) + b" tail"
    enc = t.encode_buffer(data)
    # naive decode
    out = bytearray()
    i = 0
    while i < len(enc):
        c = enc[i]
        if c == ESCAPE:
            out.append(enc[i + 1])
            i += 2
        elif c >= 0x80:
            out.extend(t.symbols[c - 0x80])
            i += 1
        else:
            out.append(c)
            i += 1
    assert bytes(out) == data
    assert t.decode_buffer(enc) == data


def test_escape_splice_matches_np_insert_across_densities():
    """The sparse slice-join and dense np.insert paths must agree with
    the reference np.insert splice at every density, including the
    crossover threshold."""
    import numpy as np

    from skar_ray.codecs.fsst import ESCAPE, _escape_splice

    rng = np.random.default_rng(0)
    for frac in (0.0, 1e-5, 1e-3, 0.02, 0.5, 1.0):
        n = 200_000
        mapped = rng.integers(0, 256, n).astype(np.uint8)
        esc = rng.random(n) < frac
        idx = np.flatnonzero(esc)
        want = np.insert(mapped, idx, ESCAPE).tobytes()
        assert _escape_splice(mapped, idx) == want, frac


def test_hybrid_chain_split_roundtrips_at_every_k():
    """The encode kernel splits the trained chain into top-K
    bytes.replace passes + one Aho-Corasick tail scan; the split point
    must never affect decode exactness (only ratio/speed).  Pin K=0
    (pure AC), the default, a mid split, and K past the chain length
    (pure chain), on data with high bytes, escapes, and repeats."""
    from skar_ray.codecs.fsst import FsstCodec

    data = (
        b"for i in range(10): print(values[i], end=' ')\n" * 400
        + bytes(range(256)) * 20
        + b"return self._cache.get(key, default)\n" * 300
    )
    codec = FsstCodec()
    table = codec.make_table(data)
    assert table._multi, "expected multi-byte symbols on this input"
    baseline = None
    for k in (0, 3, 12, 10_000):
        table._CHAIN_K = k
        table._ac = None  # rebuilt for the new split
        enc = table.encode_buffer(data)
        assert table.decode_buffer(enc) == data, k
        if baseline is None:
            baseline = len(enc)
        # every split must still compress (tail or head covers the chain)
        assert len(enc) < len(data)


def test_arrow_chain_matches_bytes_replace():
    """The pyarrow binary replace chain (the fast path) must be
    BIT-IDENTICAL to the bytes.replace fallback loop on real-ish
    content including high bytes, escapes and piece boundaries."""
    import os

    import numpy as np

    from skar_ray.codecs.fsst import FsstCodec

    rng = np.random.default_rng(11)
    data = (
        b"for i in range(10): print(values[i], end=' ')\n" * 2000
        + bytes(rng.integers(0, 256, size=5000, dtype=np.uint8))
        + b"return self._cache.get(key, default)\n" * 1500
    )
    codec = FsstCodec()
    table = codec.make_table(data)
    assert table._multi
    fast = table.encode_buffer(data)
    os.environ["SKAR_FSST_NO_ARROW"] = "1"
    try:
        slow = table.encode_buffer(data)
    finally:
        del os.environ["SKAR_FSST_NO_ARROW"]
    assert fast == slow
    assert table.decode_buffer(fast) == data
