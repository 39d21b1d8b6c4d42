"""Sinks — the reference's response/output formats, Ray-side.

skar answers queries as (a) Arrow IPC files with ZSTD-compressed
buffers (/root/reference/skar/src/server.rs:133-166) and (b) JSON with
every binary column hex-encoded as ``0x…`` strings (server.rs:289-343,
hex encoding :444-497).  Plus the obvious Parquet sink for decoded
data.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.ipc as ipc

import ray.data


def write_parquet(ds: "ray.data.Dataset", path: str, **kwargs) -> None:
    ds.write_parquet(path, **kwargs)


def write_arrow_ipc(table_or_ds, path: str) -> int:
    """One Arrow IPC file with zstd-compressed buffers (skar's
    /query/arrow-ipc response body, minus the Cap'n Proto envelope).
    For small/aggregate results — a Dataset is materialized."""
    if isinstance(table_or_ds, ray.data.Dataset):
        # stay in Arrow: to_pandas() would retype nullable int64 to
        # float64 (corrupting values past 2^53) and downgrade
        # large_string — the sink's round-trip contract is bit-fidelity
        import ray as _ray

        blocks = [
            b if isinstance(b, pa.Table) else pa.Table.from_pandas(b)
            for b in _ray.get(table_or_ds.to_arrow_refs())
        ]
        blocks = [b for b in blocks if b.num_rows]
        table = pa.concat_tables(blocks, promote_options="default") if blocks \
            else pa.Table.from_pandas(table_or_ds.to_pandas())
    else:
        table = table_or_ds
    options = ipc.IpcWriteOptions(compression="zstd")
    with ipc.new_file(path, table.schema, options=options) as w:
        w.write_table(table)
    import os

    return os.path.getsize(path)


def hex_encode_binary_columns(t: pa.Table) -> pa.Table:
    """Convert every binary column to a ``0x…`` hex Utf8 column — the
    reference's JSON response encoding (server.rs:444-497), as a
    vectorised batch op usable inside ``map_batches``."""
    out = {}
    for name in t.column_names:
        col = t.column(name)
        typ = col.type
        if pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
            import binascii

            import numpy as np

            from ..codecs import base as cbase

            arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            nulls, filled = cbase.split_nulls(arr)
            lengths, data = cbase.strings_to_buffers(filled)
            # one hexlify call for the whole buffer; per-row "0x"
            # prefixes land via a single boolean-mask scatter — the
            # non-prefix bytes ARE hexlify's output in order
            hexed_all = binascii.hexlify(data)
            out_lens = 2 * lengths + 2
            offsets = np.zeros(len(out_lens) + 1, dtype=np.int64)
            np.cumsum(out_lens, out=offsets[1:])
            buf = np.empty(int(offsets[-1]), dtype=np.uint8)
            starts = offsets[:-1]
            buf[starts] = ord("0")
            buf[starts + 1] = ord("x")
            mask = np.ones(len(buf), dtype=bool)
            mask[starts] = False
            mask[starts + 1] = False
            buf[mask] = np.frombuffer(hexed_all, dtype=np.uint8)
            hexed = cbase.strings_from_buffers(out_lens, buf.tobytes(), pa.string())
            out[name] = cbase.apply_nulls(hexed, nulls, len(arr))
        else:
            out[name] = col
    return pa.table(out)


def write_json_hex(ds: "ray.data.Dataset", path: str) -> None:
    """JSON sink with binary columns hex-encoded (skar's JSON responses)."""
    ds.map_batches(hex_encode_binary_columns, batch_format="pyarrow").write_json(path)
