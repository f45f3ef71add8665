"""Vectorized bit-(un)packing primitives.

The integer analog of the reference's byte-level parse loop
(/root/reference/src/xml_parser.rs:200-240): every value passes through a
narrow, fully-checked width — overflow is an error, never silent truncation.

All kernels are pure numpy (no per-value Python), operating on whole arrays —
the engine-side counterpart of the reference's "enum dispatch over dyn
dispatch" hot-loop discipline (/root/reference/src/xml_parser.rs:39-54):
the width branch happens once per block, never per value.
"""

from __future__ import annotations

import numpy as np

__all__ = ["bits_needed", "pack_uint", "unpack_uint"]


def bits_needed(max_value: int) -> int:
    """Minimum bit width to represent unsigned ``max_value`` (>=0). 0 -> 0 bits."""
    if max_value < 0:
        raise ValueError(f"bits_needed requires non-negative max, got {max_value}")
    return int(max_value).bit_length()


def pack_uint(values: np.ndarray, width: int) -> bytes:
    """Pack non-negative integers into ``width``-bit big-endian-within-value codes.

    ``width`` may be 0 (all values zero -> empty payload) up to 64.
    Raises if any value does not fit — the no-silent-truncation contract.
    """
    n = int(values.size)
    if width == 0:
        if n and int(values.max(initial=0)) != 0:
            raise ValueError("width=0 but non-zero values present")
        return b""
    if not 0 < width <= 64:
        raise ValueError(f"width out of range: {width}")
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if n:
        mx = int(v.max())
        if width < 64 and mx >> width:
            raise ValueError(f"value {mx} does not fit in {width} bits")
    # View each value as 8 big-endian bytes -> (n, 64) bit matrix -> keep the
    # low `width` bits of each value -> repack to bytes. Two numpy passes,
    # no Python loop.
    as_bytes = v.astype(">u8").reshape(-1, 1).view(np.uint8)
    bits = np.unpackbits(as_bytes, axis=1)  # (n, 64), MSB first
    packed = np.packbits(bits[:, 64 - width :])
    return packed.tobytes()


def unpack_uint(buf: bytes, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`pack_uint`; returns uint64 array of length ``n``."""
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    if not 0 < width <= 64:
        raise ValueError(f"width out of range: {width}")
    raw = np.frombuffer(buf, dtype=np.uint8)
    bits = np.unpackbits(raw)[: n * width].reshape(n, width)
    full = np.zeros((n, 64), dtype=np.uint8)
    full[:, 64 - width :] = bits
    return np.packbits(full, axis=1).view(">u8").reshape(n).astype(np.uint64)
