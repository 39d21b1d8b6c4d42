"""Codec protocol, registry, and shared helpers.

A codec turns one ``pyarrow.Array`` into ``(payload: bytes, meta: dict)``
and back, bit-identically.  This is the extension seam of the engine —
the analog of the reference's ``DataProvider`` trait
(/root/reference/skar/src/query/data_provider.rs:50-54), but for
compression: the auto-selector iterates the registry.

Conventions
-----------
- ``meta`` is JSON-serialisable (binary blobs inside meta are base64).
- Payload layout is codec-private; every codec round-trips nulls via the
  shared validity-prefix helpers here.
- A generic zstd "page" pass (mirroring skar's Plain-encoding +
  Zstd(9)-page scheme, /root/reference/skar/src/write_parquet.rs:49-53,
  232-244) is applied by the container layer on top of codec payloads,
  keeping whichever of {raw, zstd} is smaller.
"""

from __future__ import annotations

import struct
from typing import Protocol

import numpy as np
import pyarrow as pa

_STRING_TYPES = (pa.string(), pa.large_string())
_BINARY_TYPES = (pa.binary(), pa.large_binary())

_NUMPY_BY_NAME = {
    "int8": np.int8, "int16": np.int16, "int32": np.int32, "int64": np.int64,
    "uint8": np.uint8, "uint16": np.uint16, "uint32": np.uint32, "uint64": np.uint64,
    "float": np.float32, "double": np.float64,
    "timestamp[us]": "datetime64[us]", "timestamp[ms]": "datetime64[ms]",
    "timestamp[s]": "datetime64[s]", "timestamp[ns]": "datetime64[ns]",
}


def is_string_like(t: pa.DataType) -> bool:
    return t in _STRING_TYPES or t in _BINARY_TYPES


def is_int_like(t: pa.DataType) -> bool:
    return pa.types.is_integer(t) or pa.types.is_timestamp(t)


def is_numeric(t: pa.DataType) -> bool:
    return is_int_like(t) or pa.types.is_floating(t) or pa.types.is_boolean(t)


def is_numeric_list(t: pa.DataType) -> bool:
    """list<numeric> / large_list<numeric> — embedding columns etc."""
    return (pa.types.is_list(t) or pa.types.is_large_list(t)) and is_numeric(t.value_type)


def type_name(t: pa.DataType) -> str:
    return str(t)


def type_from_name(name: str) -> pa.DataType:
    for t in (*_STRING_TYPES, *_BINARY_TYPES, pa.bool_()):
        if str(t) == name:
            return t
    if name.startswith("timestamp["):
        return pa.timestamp(name[len("timestamp[") : -1])
    for prefix, ctor in (("list<", pa.list_), ("large_list<", pa.large_list)):
        if name.startswith(prefix) and name.endswith(">"):
            inner = name[len(prefix) : -1]
            if ": " in inner:
                inner = inner.split(": ", 1)[1]
            return ctor(type_from_name(inner))
    if name.startswith("map<") and name.endswith(">"):
        inner = name[len("map<") : -1]
        depth = 0
        for i, ch in enumerate(inner):  # first top-level comma splits key, item
            if ch == "<":
                depth += 1
            elif ch == ">":
                depth -= 1
            elif ch == "," and depth == 0:
                return pa.map_(type_from_name(inner[:i].strip()), type_from_name(inner[i + 1 :].strip()))
        raise ValueError(f"unsupported type name: {name}")
    if name.startswith("struct<") and name.endswith(">"):
        inner = name[len("struct<") : -1]
        fields = []
        depth = 0
        start = 0
        parts = []
        for i, ch in enumerate(inner):  # split on top-level commas only
            if ch == "<":
                depth += 1
            elif ch == ">":
                depth -= 1
            elif ch == "," and depth == 0:
                parts.append(inner[start:i])
                start = i + 1
        if inner:
            parts.append(inner[start:])
        for part in parts:
            fname, ftype = part.strip().split(": ", 1)
            fields.append(pa.field(fname, type_from_name(ftype)))
        return pa.struct(fields)
    if name in _NUMPY_BY_NAME:
        return pa.from_numpy_dtype(np.dtype(_NUMPY_BY_NAME[name]))
    raise ValueError(f"unsupported type name: {name}")


# ---------------------------------------------------------------- nulls

def split_nulls(arr: pa.Array) -> tuple[bytes | None, pa.Array]:
    """Return (packed validity bitmap or None, array with nulls filled).

    The filled value is type-appropriate garbage (0 / empty string); the
    bitmap restores null positions exactly on decode.
    """
    if arr.null_count == 0:
        return None, arr
    mask = np.asarray(arr.is_valid())  # bool array
    packed = np.packbits(mask).tobytes()
    if is_string_like(arr.type):
        fill = pa.scalar("" if arr.type in _STRING_TYPES else b"", type=arr.type)
    elif pa.types.is_boolean(arr.type):
        fill = pa.scalar(False, type=arr.type)
    elif pa.types.is_timestamp(arr.type):
        fill = pa.scalar(0, type=arr.type)
    else:
        fill = pa.scalar(0, type=arr.type)
    import pyarrow.compute as pc

    filled = pc.fill_null(arr, fill)
    return packed, filled


def apply_nulls(arr: pa.Array, packed: bytes | None, n: int) -> pa.Array:
    if packed is None:
        return arr
    mask = np.unpackbits(np.frombuffer(packed, dtype=np.uint8), count=n).astype(bool)
    import pyarrow.compute as pc

    return pc.if_else(pa.array(mask), arr, pa.scalar(None, type=arr.type))


# ------------------------------------------------------------ numpy I/O

def ints_to_numpy(arr: pa.Array) -> np.ndarray:
    """Zero-copy-ish view of a null-free numeric arrow array."""
    if pa.types.is_timestamp(arr.type):
        return arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
    if pa.types.is_boolean(arr.type):
        return arr.to_numpy(zero_copy_only=False)
    return arr.to_numpy(zero_copy_only=False)


def strings_to_buffers(arr: pa.Array) -> tuple[np.ndarray, bytes]:
    """(lengths int64[n], concatenated value bytes) of a null-free string/binary array."""
    if arr.type in (pa.string(), pa.binary()):
        arr = arr.cast(pa.large_string() if arr.type == pa.string() else pa.large_binary())
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=np.int64, count=len(arr) + 1 + arr.offset)[arr.offset:]
    data = buffers[2].to_pybytes() if buffers[2] is not None else b""
    data = data[offsets[0] : offsets[-1]]
    lengths = np.diff(offsets)
    return lengths, data


def strings_from_buffers(lengths: np.ndarray, data: bytes, out_type: pa.DataType) -> pa.Array:
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    if out_type in (pa.string(), pa.binary()):
        if offsets[-1] > np.iinfo(np.int32).max:
            # a silent int32 narrow would corrupt every offset past 2 GiB;
            # chunk capping makes this rare but a heavy-tail partition can
            # breach it — promote to the 64-bit offset type instead
            out_type = pa.large_string() if out_type == pa.string() else pa.large_binary()
            obuf = pa.py_buffer(offsets.tobytes())
        else:
            obuf = pa.py_buffer(offsets.astype(np.int32).tobytes())
    else:
        obuf = pa.py_buffer(offsets.tobytes())
    return pa.Array.from_buffers(out_type, len(lengths), [None, obuf, pa.py_buffer(data)])


# -------------------------------------------------------------- framing

def pack_sections(*sections: bytes) -> bytes:
    """Length-prefixed concatenation: [u32 count][u64 len]*count + blobs."""
    head = struct.pack("<I", len(sections)) + b"".join(
        struct.pack("<Q", len(s)) for s in sections
    )
    return head + b"".join(sections)


def unpack_sections(payload: bytes) -> list[bytes]:
    (count,) = struct.unpack_from("<I", payload, 0)
    off = 4
    lens = []
    for _ in range(count):
        (ln,) = struct.unpack_from("<Q", payload, off)
        lens.append(ln)
        off += 8
    out = []
    for ln in lens:
        out.append(payload[off : off + ln])
        off += ln
    return out


# -------------------------------------------------------------- protocol

class Codec(Protocol):
    name: str

    def can_encode(self, t: pa.DataType) -> bool: ...

    def encode(self, arr: pa.Array) -> tuple[bytes, dict]: ...

    def decode(self, payload: bytes, meta: dict, n: int) -> pa.Array: ...


_REGISTRY: dict[str, Codec] = {}


def register(codec: Codec) -> Codec:
    _REGISTRY[codec.name] = codec
    return codec


def get_codec(name: str) -> Codec:
    return _REGISTRY[name]


def all_codecs() -> dict[str, Codec]:
    return dict(_REGISTRY)


def encode_array(arr: pa.Array, codec_name: str) -> tuple[bytes, dict]:
    payload, meta = get_codec(codec_name).encode(arr)
    meta["codec"] = codec_name
    meta["type"] = type_name(arr.type)
    meta["n"] = len(arr)
    return payload, meta


def decode_array(payload: bytes, meta: dict) -> pa.Array:
    return get_codec(meta["codec"]).decode(payload, meta, meta["n"])
