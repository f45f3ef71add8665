"""Codec registry: name -> (encode, decode) over whole value streams.

Integer codecs take/return numpy integer arrays; string codecs take/return
:class:`~xml2arrow_spark.codecs.base.StrData`. Dispatch happens once per
block per column — never per value — mirroring the reference's
enum-dispatch builder design (/root/reference/src/xml_parser.rs:39-54).
"""

from __future__ import annotations

from xml2arrow_spark.codecs import floats, integers, strings
from xml2arrow_spark.codecs.base import StrData

INT_CODECS = {
    "plain": (integers.encode_plain, integers.decode_plain),
    "bitpack": (integers.encode_bitpack, integers.decode_bitpack),
    "for": (integers.encode_for, integers.decode_for),
    "delta": (integers.encode_delta, integers.decode_delta),
    "rle": (integers.encode_rle, integers.decode_rle),
    "dict": (integers.encode_dict, integers.decode_dict),
    "pdict": (integers.encode_pdict, integers.decode_pdict),
    "pfor": (integers.encode_pfor, integers.decode_pfor),
}

STR_CODECS = {
    "plain_str": (strings.encode_plain_str, strings.decode_plain_str),
    "dict_str": (strings.encode_dict_str, strings.decode_dict_str),
    "fsst": (strings.encode_fsst, strings.decode_fsst),
    "seq_str": (strings.encode_seq_str, strings.decode_seq_str),
}

FLOAT_CODECS = {
    "plain_float": (floats.encode_plain_float, floats.decode_plain_float),
    "dec_float": (floats.encode_dec_float, floats.decode_dec_float),
    "alp_float": (floats.encode_alp_float, floats.decode_alp_float),
    "bss_float": (floats.encode_bss_float, floats.decode_bss_float),
}

BOOL_CODECS = {
    "bool_pack": (floats.encode_bool, floats.decode_bool),
}

ALL_CODECS = {**INT_CODECS, **STR_CODECS, **FLOAT_CODECS, **BOOL_CODECS}

# General-purpose entropy coders usable as a CASCADE stage on top of any
# lightweight codec's payload ("<codec>+zstd" in a ColumnPolicy) — the
# BtrBlocks/Parquet layering: lightweight encodings expose structure,
# the general coder squeezes the residual entropy. Applied per block,
# skipped automatically when it doesn't pay.
GENERAL_CODECS = ("zstd", "lz4")


def encode_values(codec: str, values):
    """Encode a numpy int array or StrData with the named codec."""
    try:
        enc, _ = ALL_CODECS[codec]
    except KeyError:
        from xml2arrow_spark.errors import UnknownCodecError

        raise UnknownCodecError(f"unknown codec {codec!r}; known: {sorted(ALL_CODECS)}") from None
    return enc(values)


def decode_values(meta: dict, blob: bytes):
    """Decode from a block header + blob; codec name is read from the header."""
    codec = meta["codec"]
    _, dec = ALL_CODECS[codec]
    return dec(meta, blob)


__all__ = [
    "INT_CODECS",
    "STR_CODECS",
    "ALL_CODECS",
    "StrData",
    "encode_values",
    "decode_values",
]
