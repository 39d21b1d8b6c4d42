"""Run-length codec — sorted / run-heavy columns.

After the per-partition lexsort by (repo, path, commit) — the analog of
the reference's pre-write lexsort (/root/reference/skar/src/
write_parquet.rs:22-35,131-153) — ``repo``, ``lang`` and ``commit``
become long runs.  Strategy: dictionary-encode to integer codes, find
run boundaries vectorised (``np.flatnonzero(diff != 0)``), store run
codes + run lengths bit-packed and the distinct values plain-encoded.
Integer columns RLE directly over their values.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import base
from .dictionary import dict_encode_to_parts
from .for_bitpack import pack_ints_with_reference, unpack_ints_with_reference
from .plain import PlainCodec

_plain = PlainCodec()


def run_bounds(codes: np.ndarray) -> np.ndarray:
    """Start index of every run in `codes` (always includes 0 when non-empty)."""
    if len(codes) == 0:
        return np.zeros(0, dtype=np.int64)
    change = np.flatnonzero(np.diff(codes) != 0) + 1
    return np.concatenate([[0], change]).astype(np.int64)


class RleCodec:
    name = "rle"

    def can_encode(self, t: pa.DataType) -> bool:
        return base.is_string_like(t) or base.is_numeric(t)

    def encode(self, arr: pa.Array) -> tuple[bytes, dict]:
        nulls, filled = base.split_nulls(arr)
        indices, values = dict_encode_to_parts(filled)
        starts = run_bounds(indices)
        run_codes = indices[starts] if len(starts) else indices[:0]
        run_lens = np.diff(np.concatenate([starts, [len(indices)]])) if len(starts) else starts
        codes_payload, codes_meta = pack_ints_with_reference(run_codes.astype(np.int64))
        lens_payload, lens_meta = pack_ints_with_reference(run_lens.astype(np.int64))
        val_payload, val_meta = _plain.encode(values)
        val_meta["type"] = base.type_name(values.type)
        val_meta["n"] = len(values)
        meta = {
            "n_runs": len(run_codes),
            "codes_meta": codes_meta,
            "lens_meta": lens_meta,
            "values_meta": val_meta,
            "has_nulls": nulls is not None,
        }
        return base.pack_sections(nulls or b"", codes_payload, lens_payload, val_payload), meta

    def decode(self, payload: bytes, meta: dict, n: int) -> pa.Array:
        t = base.type_from_name(meta["type"])
        nulls_b, codes_payload, lens_payload, val_payload = base.unpack_sections(payload)
        k = meta["n_runs"]
        run_codes = unpack_ints_with_reference(codes_payload, meta["codes_meta"], k)
        run_lens = unpack_ints_with_reference(lens_payload, meta["lens_meta"], k)
        indices = np.repeat(run_codes, run_lens)
        vm = meta["values_meta"]
        values = _plain.decode(val_payload, vm, vm["n"])
        arr = values.take(pa.array(indices.astype(np.int64)))
        if arr.type != t:
            arr = arr.cast(t)
        return base.apply_nulls(arr, nulls_b if meta.get("has_nulls") else None, n)


base.register(RleCodec())
