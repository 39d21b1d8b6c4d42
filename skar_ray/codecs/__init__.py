"""Codec registry: plain, dict, rle, for_bitpack, fsst + auto-selector."""

from . import base, plain, dictionary, rle, for_bitpack, fsst, delta, auto  # noqa: F401
from .base import encode_array, decode_array, all_codecs, get_codec  # noqa: F401
from .auto import encode_column, decode_column, select_codec, Encoded  # noqa: F401
