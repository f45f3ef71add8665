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

from xml2arrow_spark.errors import EncodeValueError

__all__ = ["bits_needed", "pack_uint", "unpack_uint"]


def bits_needed(max_value: int) -> int:
    """Minimum bit width to represent unsigned ``max_value`` (>=0). 0 -> 0 bits."""
    if max_value < 0:
        raise EncodeValueError(f"bits_needed requires non-negative max, got {max_value}")
    return int(max_value).bit_length()


# Byte-aligned fast paths: widths 8/16/32/64 store values as NATIVE
# little-endian narrow integers (a pure truncating cast — measured 2x the
# big-endian cast, which pays a byteswap pass). Non-aligned widths use the
# MSB-first bit-matrix stream; the two sub-formats are distinguished by
# width alone, so pack/unpack always agree.
_ALIGNED = {8: "<u1", 16: "<u2", 32: "<u4", 64: "<u8"}

# Narrowest big-endian container holding `width` bits. Working in the small
# container instead of upcasting to uint64 matters twice: per-core speed AND
# multi-core scaling — the kernel is memory-bandwidth-bound, so bytes moved
# per token is what the 8->32-core efficiency target rides on.
def _container(width: int) -> tuple[str, int]:
    if width <= 8:
        return ">u1", 1
    if width <= 16:
        return ">u2", 2
    if width <= 32:
        return ">u4", 4
    return ">u8", 8

# Chunk length for the general path: multiple of 8 so every chunk boundary is
# byte-aligned for ANY width (8 values x width bits ≡ width bytes). Bounds the
# unpackbits intermediate to ~width MB per task instead of O(block).
_CHUNK = 4 * 1024 * 1024


def pack_uint(values: np.ndarray, width: int) -> bytes:
    """Pack non-negative integers into ``width``-bit big-endian-within-value codes.

    ``width`` may be 0 (all values zero -> empty payload) up to 64.
    Raises if any value does not fit — the no-silent-truncation contract.
    """
    n = int(values.size)
    if width == 0:
        if n and int(values.max(initial=0)) != 0:
            raise EncodeValueError("width=0 but non-zero values present")
        return b""
    if not 0 < width <= 64:
        raise EncodeValueError(f"width out of range: {width}")
    v = np.ascontiguousarray(values)
    if n:
        if v.dtype.kind == "i" and int(v.min()) < 0:
            raise EncodeValueError("pack_uint requires non-negative values")
        mx = int(v.max())
        if width < 64 and mx >> width:
            raise EncodeValueError(f"value {mx} does not fit in {width} bits")
    dt = _ALIGNED.get(width)
    if dt is not None:
        return v.astype(dt).tobytes()
    cdt, cbytes = _container(width)
    nb = (width + 7) // 8
    out = []
    for lo in range(0, n, _CHUNK):
        # low nb big-endian bytes of each value -> bit matrix -> keep the low
        # `width` bits -> repack. Two numpy passes, no Python loop per value.
        chunk = v[lo : lo + _CHUNK].astype(cdt)
        as_bytes = chunk.view(np.uint8).reshape(-1, cbytes)[:, cbytes - nb :]
        bits = np.unpackbits(np.ascontiguousarray(as_bytes), axis=1)
        out.append(np.packbits(bits[:, nb * 8 - width :]).tobytes())
    return b"".join(out)


def unpack_uint(buf: bytes, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`pack_uint`; returns uint64 array of length ``n``."""
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    if not 0 < width <= 64:
        raise EncodeValueError(f"width out of range: {width}")
    dt = _ALIGNED.get(width)
    if dt is not None:
        return np.frombuffer(buf, dtype=dt, count=n).astype(np.uint64)
    nb = (width + 7) // 8
    raw = np.frombuffer(buf, dtype=np.uint8)
    out = np.empty(n, dtype=np.uint64)
    # gather decode for width <= 56 (r06): each value's bits span at most
    # ceil((width + 7) / 8) + 1 consecutive bytes; gather them with ONE
    # fancy index, fold big-endian, shift+mask. Replaces the
    # unpackbits -> pad -> packbits -> view chain (6 full-array
    # temporaries) — measured 1.5-2x on 8192-value blocks (the FOR/delta
    # decode hot path both the fused kernels and the driver-side metadata
    # aggregates ride); below ~2k values the old path's fewer small
    # allocations win (17 vs 25 us at 256), so tiny blocks keep it.
    # Widths 57..63 would overflow the uint64 byte fold (9 gathered
    # bytes) and keep the bit-matrix path too.
    use_gather = width <= 56 and n >= 2048
    m = (width + 14) // 8  # bytes gathered per value (worst bit offset 7)
    mask = np.uint64((1 << width) - 1)
    for lo in range(0, n, _CHUNK):
        cn = min(_CHUNK, n - lo)
        blo = lo * width // 8  # byte-aligned: lo is a multiple of 8
        if use_gather:
            chunk_bytes = raw[blo : blo + (cn * width + 7) // 8]
            if chunk_bytes.size < ((cn - 1) * width) // 8 + m:
                pad = np.zeros(
                    ((cn - 1) * width) // 8 + m - chunk_bytes.size, np.uint8
                )
                chunk_bytes = np.concatenate((chunk_bytes, pad))
            start_bit = np.arange(cn, dtype=np.int64) * width
            first_byte = start_bit >> 3
            g = chunk_bytes[
                first_byte[:, None] + np.arange(m, dtype=np.int64)
            ].astype(np.uint64)
            acc = g[:, 0]
            for k in range(1, m):
                acc = (acc << np.uint64(8)) | g[:, k]
            rshift = (np.uint64(8 * m - width) - (start_bit & 7).astype(np.uint64))
            out[lo : lo + cn] = (acc >> rshift) & mask
        else:
            bits = np.unpackbits(raw[blo : blo + (cn * width + 7) // 8])[: cn * width]
            full = np.zeros((cn, nb * 8), dtype=np.uint8)
            full[:, nb * 8 - width :] = bits.reshape(cn, width)
            packed = np.packbits(full, axis=1)  # (cn, nb) big-endian low bytes
            wide = np.zeros((cn, 8), dtype=np.uint8)
            wide[:, 8 - nb :] = packed
            out[lo : lo + cn] = wide.reshape(-1).view(">u8").astype(np.uint64)
    return out
