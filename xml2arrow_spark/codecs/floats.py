"""Float and boolean codecs.

The reference's type system (Boolean, Float32, Float64 among its 12
primitives — /root/reference/src/config.rs:526-541) must round-trip through
the engine too. Floats are stored as raw IEEE bytes (``plain_float``):
bit-identical by construction, NaN payloads and signed zeros included —
the float analog of the no-silent-truncation contract. Booleans bit-pack
8 values/byte (``bool_pack``).

Lightweight float compression (Gorilla-style XOR, ALP) is sequential per
value and out of v1 scope; plain keeps decode zero-cost and exact.
"""

from __future__ import annotations

import numpy as np

from xml2arrow_spark.codecs.base import pack_sections, split_sections
from xml2arrow_spark.errors import EncodeTypeError

__all__ = [
    "encode_plain_float",
    "decode_plain_float",
    "encode_bool",
    "decode_bool",
]

FLOAT_DTYPES = {"float32": np.float32, "float64": np.float64}


def encode_plain_float(values: np.ndarray) -> tuple[dict, bytes]:
    name = values.dtype.name
    if name not in FLOAT_DTYPES:
        raise EncodeTypeError(f"unsupported float dtype: {name}")
    v = np.ascontiguousarray(values)
    sections, blob = pack_sections({"values": v.tobytes()})
    return {
        "codec": "plain_float",
        "dtype": name,
        "n": int(v.size),
        "sections": sections,
    }, blob


def decode_plain_float(meta: dict, blob: bytes) -> np.ndarray:
    parts = split_sections(meta, blob)
    return np.frombuffer(
        parts["values"], dtype=FLOAT_DTYPES[meta["dtype"]], count=meta["n"]
    ).copy()


def encode_bool(values: np.ndarray) -> tuple[dict, bytes]:
    if values.dtype != np.bool_:
        raise EncodeTypeError(f"bool_pack requires bool values, got {values.dtype}")
    sections, blob = pack_sections({"values": np.packbits(values).tobytes()})
    return {
        "codec": "bool_pack",
        "n": int(values.size),
        "sections": sections,
    }, blob


def decode_bool(meta: dict, blob: bytes) -> np.ndarray:
    parts = split_sections(meta, blob)
    n = meta["n"]
    raw = np.frombuffer(parts["values"], dtype=np.uint8)
    return np.unpackbits(raw)[:n].astype(np.bool_)
