"""Property-based codec round-trips (hypothesis) — randomized analog of
the reference's scalar edge tests (format/src/types/quantity.rs:117-189)."""

import numpy as np
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from skar_ray.codecs import decode_array, encode_array
from skar_ray.codecs.fsst import SymbolTable, train_symbols

_SETTINGS = dict(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

texts = st.lists(
    st.one_of(st.none(), st.text(max_size=200)),
    max_size=80,
)
ints = st.lists(
    st.one_of(st.none(), st.integers(min_value=-(2**62), max_value=2**62)),
    max_size=80,
)
floats = st.lists(
    st.one_of(st.none(), st.floats(allow_nan=False, width=64)),
    max_size=80,
)
payloads = st.binary(max_size=4096)


@settings(**_SETTINGS)
@given(vals=texts, codec=st.sampled_from(["plain", "dict", "rle", "fsst"]))
def test_string_codecs_roundtrip(vals, codec):
    arr = pa.array(vals, type=pa.string())
    payload, meta = encode_array(arr, codec)
    assert decode_array(payload, meta).equals(arr)


@settings(**_SETTINGS)
@given(vals=ints, codec=st.sampled_from(["plain", "dict", "rle", "for_bitpack", "delta"]))
def test_int_codecs_roundtrip(vals, codec):
    arr = pa.array(vals, type=pa.int64())
    payload, meta = encode_array(arr, codec)
    assert decode_array(payload, meta).equals(arr)


@settings(**_SETTINGS)
@given(vals=floats, codec=st.sampled_from(["plain", "dict", "rle"]))
def test_float_codecs_roundtrip(vals, codec):
    arr = pa.array(vals, type=pa.float64())
    payload, meta = encode_array(arr, codec)
    assert decode_array(payload, meta).equals(arr)


@settings(**_SETTINGS)
@given(data=payloads, train_on=payloads)
def test_fsst_buffer_roundtrip_any_bytes(data, train_on):
    """decode(encode(x)) == x for arbitrary byte strings under a table
    trained on unrelated bytes (worst-case table mismatch)."""
    t = SymbolTable(train_symbols(train_on))
    assert t.decode_buffer(t.encode_buffer(data)) == data


@settings(**_SETTINGS)
@given(data=st.binary(min_size=1, max_size=65536 * 3))
def test_fsst_piece_boundaries(data):
    """Round-trip across the 64 KiB piece boundary of the encoder."""
    t = SymbolTable(train_symbols(data))
    assert t.decode_buffer(t.encode_buffer(data)) == data


@settings(**_SETTINGS)
@given(data=st.binary(min_size=16, max_size=8192))
def test_window_counts_match_void_unique(data):
    """The uint64-packed (L<=8) and FNV-hashed (L>8) window counters
    must agree with the void-view np.unique ground truth — same
    distinct-window count, same count multiset, and every recovered
    representative must be a real window."""
    import numpy as np

    from skar_ray.codecs.fsst import _window_counts

    buf = np.frombuffer(data, dtype=np.uint8)
    for L in (2, 5, 8, 9, 13):
        if len(buf) <= L:
            continue
        win = np.lib.stride_tricks.sliding_window_view(buf, L)
        win = np.ascontiguousarray(win[(win < 0x80).all(axis=1)])
        if len(win) == 0:
            continue
        idx, counts = _window_counts(win, L)
        view = win.view(np.dtype((np.void, L))).ravel()
        _, ref_counts = np.unique(view, return_counts=True)
        assert len(counts) == len(ref_counts)
        assert sorted(counts.tolist()) == sorted(ref_counts.tolist())
        grams = {win[i].tobytes() for i in idx.tolist()}
        assert len(grams) == len(counts)  # representatives are distinct windows
