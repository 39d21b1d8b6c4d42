"""`.skarc` container — one file per partition of encoded columns.

Layout: ``b"SKRC1\\n"`` magic, u64 little-endian header length, JSON
header, blob area.  The header holds the schema and, per chunk ("row
group" analog — the reference slices sorted chunks into 10k-row row
groups, /root/reference/skar/src/write_parquet.rs:83-103), per column:
codec name, codec meta, page codec, offsets into the blob area and the
size triple (raw arrow bytes / codec payload bytes / final blob bytes).

Written atomically: the caller writes to ``<path>.tmp`` and renames —
the reference's temp-folder + rename publish step
(/root/reference/skar/src/skar_runner.rs:296-321).
"""

from __future__ import annotations

import json
import os
import struct

import pyarrow as pa

from ..codecs import auto, base

MAGIC = b"SKRC1\n"


def _chunk_minmax(col) -> dict | None:
    """Typed per-chunk min/max stats — the per-row-group min/max the
    reference stores for pruning (build_parquet_idx.rs:50-70).  Stored
    as a stats dict ({"min","max","t"}) compared natively by
    state.pruning; legacy containers hold a [lo, hi] string list."""
    from .pruning import minmax_stat

    try:
        st = minmax_stat(col)
        return st or None
    except Exception:
        return None


def write_container(path: str, table: pa.Table, chunk_rows: list[tuple[int, int]] | None = None,
                    codec_overrides: dict[str, str] | None = None,
                    extra: dict | None = None) -> dict:
    """Encode `table` chunk-by-chunk and write the container atomically.

    ``chunk_rows`` is a list of (offset, length) slices; default one
    chunk.  Returns the header dict (with per-column byte accounting).
    """
    if chunk_rows is None:
        chunk_rows = [(0, table.num_rows)]
    codec_overrides = codec_overrides or {}

    # partition-level codec plan: select ONCE per column (sampled), and
    # train ONE FSST symbol table per column per partition (the
    # north-star's per-partition symbol tables) reused across chunks —
    # per-chunk re-training/re-selection would dominate encode time.
    plan: dict[str, tuple[str, object, dict]] = {}
    for name in table.column_names:
        col = table.column(name)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        fsst_table = None
        if auto.base.is_string_like(col.type) and len(col):
            import pyarrow.compute as pc

            sample = auto.sample_of(col)
            distinct_ratio = pc.count_distinct(sample).as_py() / max(1, len(sample))
            if distinct_ratio >= 0.05:  # low-cardinality ⇒ dict wins, skip training
                from ..codecs import base as cbase
                from ..codecs.fsst import FsstCodec

                _, data = cbase.strings_to_buffers(cbase.split_nulls(col)[1])
                fsst_table = FsstCodec().make_table(data)
        codec = codec_overrides.get(name)
        estimates: dict = {}
        if codec is None:
            codec, estimates = auto.select_codec(col, fsst_table=fsst_table)
        if codec != "fsst":
            fsst_table = None
        plan[name] = (codec, fsst_table, estimates)

    chunks_meta = []
    blobs: list[bytes] = []
    blob_off = 0
    first_chunk = True
    for (off, ln) in chunk_rows:
        sl = table.slice(off, ln)
        cols_meta = []
        for name in table.column_names:
            col = sl.column(name)
            codec, fsst_table, estimates = plan[name]
            enc = auto.encode_column(col, codec, fsst_table=fsst_table)
            if first_chunk:
                enc.estimates = estimates
            minmax = _chunk_minmax(col)
            cols_meta.append(
                {
                    "name": name,
                    "codec": enc.codec,
                    "meta": enc.meta,
                    "page": enc.page,
                    "offset": blob_off,
                    "length": len(enc.blob),
                    "payload_len": enc.payload_len,
                    "raw_bytes": enc.raw_bytes,
                    "estimates": enc.estimates,
                    "minmax": minmax,
                }
            )
            blobs.append(enc.blob)
            blob_off += len(enc.blob)
        chunks_meta.append({"n_rows": ln, "columns": cols_meta})
        first_chunk = False
    header = {
        "version": 1,
        "schema": [[f.name, str(f.type)] for f in table.schema],
        "chunks": chunks_meta,
        "extra": extra or {},
    }
    hjson = json.dumps(header).encode("utf-8")
    tmp = f"{path}.tmp-{os.getpid()}"  # unique per writer: a retried/speculative task must not tear a peer's temp file
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for b in blobs:
            f.write(b)
    os.replace(tmp, path)
    return header


def read_header(path: str) -> tuple[dict, int]:
    with open(path, "rb") as f:
        magic = f.read(len(MAGIC))
        if magic != MAGIC:
            raise ValueError(f"bad container magic in {path}")
        (hlen,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen).decode("utf-8"))
    return header, len(MAGIC) + 8 + hlen


def encoded_equality_mask(blob: bytes, cm: dict, values: list) -> "np.ndarray | None":
    """Evaluate ``col ∈ values`` directly on the ENCODED form of a
    dict/rle column — the §2.10 'predicate filter on encoded form':
    decode only the (small) dictionary, find the matching codes, and
    build the row mask from the index/run stream without materializing
    the value column.  Returns None when the codec doesn't support it.
    """
    import numpy as np

    from ..codecs import base as cbase
    from ..codecs.for_bitpack import bitunpack, unpack_ints_with_reference
    from ..codecs.plain import PlainCodec

    meta = cm["meta"]
    if cm["codec"] not in ("dict", "rle") or meta.get("has_nulls"):
        return None  # fallback: decode + compare (nulls need the bitmap)
    payload = auto.page_decompress(blob, cm["page"], cm["payload_len"])
    n = meta["n"]
    plain = PlainCodec()
    if cm["codec"] == "dict":
        _nulls, idx_payload, val_payload = cbase.unpack_sections(payload)
        vm = meta["values_meta"]
        dict_vals = plain.decode(val_payload, vm, vm["n"])
        match_codes = {i for i, v in enumerate(dict_vals.to_pylist()) if v in values}
        indices = bitunpack(idx_payload, meta["width"], n)
        return np.isin(indices, np.array(sorted(match_codes), dtype=np.uint64))
    # rle: expand run codes -> mask, without touching the value payload sizes
    _nulls, codes_payload, lens_payload, val_payload = cbase.unpack_sections(payload)
    k = meta["n_runs"]
    run_codes = unpack_ints_with_reference(codes_payload, meta["codes_meta"], k)
    run_lens = unpack_ints_with_reference(lens_payload, meta["lens_meta"], k)
    vm = meta["values_meta"]
    dict_vals = plain.decode(val_payload, vm, vm["n"])
    match_codes = {i for i, v in enumerate(dict_vals.to_pylist()) if v in values}
    run_match = np.isin(run_codes, np.array(sorted(match_codes), dtype=np.int64))
    return np.repeat(run_match, run_lens)


def read_container(path: str, columns: list[str] | None = None,
                   chunk_indices: list[int] | None = None,
                   dnf=None, encoded_filter: tuple[str, list] | None = None) -> pa.Table:
    """Decode a container back to a pyarrow Table (projected, chunk-pruned).

    Mirrors the reference's projected + row-group-pruned Parquet reader
    (/root/reference/skar/src/query/data_provider.rs:121-183).  ``dnf``
    prunes whole chunks via their per-column min/max (row-group skip,
    data_provider.rs:250-333) — the decoded result still needs the
    exact row filter applied downstream.
    """
    header, blob_start = read_header(path)
    schema_cols = [name for name, _ in header["schema"]]
    want = columns or schema_cols
    chunks = header["chunks"]
    if chunk_indices is not None:
        chunks = [chunks[i] for i in chunk_indices]
    if dnf:
        from .pruning import dnf_possible

        def keep(ch):
            mm = {
                cm["name"]: cm.get("minmax") for cm in ch["columns"] if cm.get("minmax")
            }

            def stats_of(c):
                st = mm.get(c)
                if st is None:
                    return {}
                if isinstance(st, list):  # legacy [lo, hi] string pair
                    return {"min": st[0], "max": st[1], "t": "s"}
                return st

            return dnf_possible(stats_of, dnf)

        chunks = [ch for ch in chunks if keep(ch)]
    arrays: dict[str, list[pa.Array]] = {name: [] for name in want}
    with open(path, "rb") as f:
        for ch in chunks:
            mask = None
            if encoded_filter is not None:
                fcol, fvals = encoded_filter
                for cm in ch["columns"]:
                    if cm["name"] == fcol:
                        f.seek(blob_start + cm["offset"])
                        blob = f.read(cm["length"])
                        mask = encoded_equality_mask(blob, cm, fvals)
                        if mask is None:  # codec not maskable: decode + compare
                            arr = auto.decode_column(blob, cm["meta"], cm["page"], cm["payload_len"])
                            import numpy as np
                            import pyarrow.compute as pc

                            mask = np.asarray(
                                pc.is_in(arr, value_set=pa.array(sorted(fvals)))
                            )
                        break
            for cm in ch["columns"]:
                if cm["name"] not in arrays:
                    continue
                f.seek(blob_start + cm["offset"])
                blob = f.read(cm["length"])
                arr = auto.decode_column(blob, cm["meta"], cm["page"], cm["payload_len"])
                if mask is not None:
                    arr = arr.filter(pa.array(mask))
                arrays[cm["name"]].append(arr)
    type_by_name = dict(header["schema"])
    out = {}
    for name in want:
        parts = arrays[name]
        t = base.type_from_name(type_by_name[name])
        out[name] = pa.chunked_array(parts) if parts else pa.chunked_array([], type=t)
    return pa.table(out)
