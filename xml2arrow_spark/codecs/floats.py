"""Float and boolean codecs.

The reference's type system (Boolean, Float32, Float64 among its 12
primitives — /root/reference/src/config.rs:526-541) must round-trip through
the engine too. Floats are stored as raw IEEE bytes (``plain_float``):
bit-identical by construction, NaN payloads and signed zeros included —
the float analog of the no-silent-truncation contract. Booleans bit-pack
8 values/byte (``bool_pack``).

``dec_float`` is the ALP idea (Adaptive Lossless floating-Point, Afroozeh &
Boncz) reduced to its all-or-nothing core: most real-world doubles are
decimals in disguise (prices, quantities, rates), so try ``v * 10^k`` for
small k, and if EVERY value round-trips **bit-identically** through the
int64 → divide decode path, store the integers with the integer-codec
family (FOR/dict/delta — 64 bits/value becomes ~2-8). The verification is
against the exact decode expression, so a block containing -0.0, NaN, inf,
or a true non-decimal simply falls back to plain — eligibility can never
cost correctness. (Per-value exception patching, ALP's second half, is
deliberately omitted: the all-or-nothing check keeps decode branch-free.)
"""

from __future__ import annotations

import numpy as np

from xml2arrow_spark.codecs.base import pack_sections, split_sections
from xml2arrow_spark.errors import EncodeTypeError, EncodeValueError

__all__ = [
    "encode_plain_float",
    "decode_plain_float",
    "encode_dec_float",
    "decode_dec_float",
    "encode_alp_float",
    "decode_alp_float",
    "encode_bss_float",
    "decode_bss_float",
    "choose_float_codec",
    "encode_bool",
    "decode_bool",
]

FLOAT_DTYPES = {"float32": np.float32, "float64": np.float64}

DEC_MAX_EXP = 6  # probe v*10^0 .. v*10^6 (beyond that the win evaporates)
_DEC_MAX_ABS = float(2**53)  # scaled magnitude must stay exactly representable


_DEC_SAMPLE = 4096


def _dec_verify(v: np.ndarray, k: int) -> np.ndarray | None:
    """int64 candidates for exponent k iff decode reproduces v
    BIT-identically (catches -0.0, ties, and every non-decimal)."""
    scale = float(10**k)
    with np.errstate(over="ignore"):  # huge v*scale -> inf -> rejected below
        scaled = v * scale
    if np.abs(scaled).max() >= _DEC_MAX_ABS:
        return None
    ints = np.round(scaled).astype(np.int64)
    if np.array_equal((ints.astype(np.float64) / scale).view(np.uint64), v.view(np.uint64)):
        return ints
    return None


def _dec_probe(v: np.ndarray) -> tuple[int, np.ndarray] | None:
    """Smallest exponent k such that round(v * 10^k) decoded as
    int64/10^k reproduces v bit-identically; None if no k works.

    Two-stage to keep the REJECT path cheap: the exponent search runs on a
    head sample first, so a truly non-decimal block pays ~7 passes over
    4096 values instead of over the whole block; only a sample-accepted
    exponent is then verified on the full block (continuing upward if the
    tail needs more digits than the head)."""
    if v.size == 0:
        return 0, np.zeros(0, dtype=np.int64)
    if not np.isfinite(v).all():
        return None
    head = v[:_DEC_SAMPLE]
    k0 = next(
        (k for k in range(DEC_MAX_EXP + 1) if _dec_verify(head, k) is not None),
        None,
    )
    if k0 is None:
        return None
    for k in range(k0, DEC_MAX_EXP + 1):
        ints = _dec_verify(v, k)
        if ints is not None:
            return k, ints
    return None


def _dec_verify32(v32: np.ndarray, v64: np.ndarray, k: int) -> np.ndarray | None:
    """Float32 twin of :func:`_dec_verify`: the probe runs in float64 (an
    exact widening of every float32), and verification round-trips through
    the ACTUAL decode path — int64 -> /scale -> cast to float32 — compared
    bit-for-bit against the original float32 payload."""
    scale = float(10**k)
    with np.errstate(over="ignore"):
        scaled = v64 * scale
    if np.abs(scaled).max() >= _DEC_MAX_ABS:
        return None
    ints = np.round(scaled).astype(np.int64)
    decoded = (ints.astype(np.float64) / scale).astype(np.float32)
    if np.array_equal(decoded.view(np.uint32), v32.view(np.uint32)):
        return ints
    return None


def _dec_probe32(v32: np.ndarray) -> tuple[int, np.ndarray] | None:
    """Float32 twin of :func:`_dec_probe` (same two-stage head-sample probe)."""
    if v32.size == 0:
        return 0, np.zeros(0, dtype=np.int64)
    if not np.isfinite(v32).all():
        return None
    v64 = v32.astype(np.float64)
    head32, head64 = v32[:_DEC_SAMPLE], v64[:_DEC_SAMPLE]
    k0 = next(
        (k for k in range(DEC_MAX_EXP + 1) if _dec_verify32(head32, head64, k) is not None),
        None,
    )
    if k0 is None:
        return None
    for k in range(k0, DEC_MAX_EXP + 1):
        ints = _dec_verify32(v32, v64, k)
        if ints is not None:
            return k, ints
    return None


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


def encode_dec_float(values: np.ndarray) -> tuple[dict, bytes]:
    """Decimal-scaled float encode (see module doc). Raises
    :class:`EncodeValueError` when the block is not exactly decimal —
    callers treat that as 'use plain_float', never as data loss."""
    if values.dtype.name == "float64":
        probe = _dec_probe(np.ascontiguousarray(values))
    elif values.dtype.name == "float32":
        probe = _dec_probe32(np.ascontiguousarray(values))
    else:
        raise EncodeValueError("dec_float supports float32/float64 only")
    if probe is None:
        raise EncodeValueError("values are not exactly decimal; use plain_float")
    k, ints = probe
    from xml2arrow_spark.codecs.integers import (  # lazy: avoid import cycle
        encode_dict,
        encode_delta,
        encode_for,
        encode_pdict,
        encode_pfor,
        encode_plain,
        encode_rle,
    )
    from xml2arrow_spark.plans.selector import choose_int_codec

    inner = choose_int_codec(ints)
    enc = {
        "plain": encode_plain, "for": encode_for, "delta": encode_delta,
        "rle": encode_rle, "dict": encode_dict, "pdict": encode_pdict,
        "pfor": encode_pfor,
        "bitpack": encode_for,  # FOR is always safe; bitpack needs >=0
    }[inner]
    int_meta, blob = enc(ints)
    return {
        "codec": "dec_float",
        "dtype": values.dtype.name,
        "n": int(values.size),
        "exp": k,
        "int_meta": int_meta,
    }, blob


def decode_dec_float(meta: dict, blob: bytes) -> np.ndarray:
    from xml2arrow_spark.codecs import decode_values

    ints = decode_values(meta["int_meta"], blob).astype(np.int64)
    scale = float(10 ** meta["exp"])
    out = ints.astype(np.float64) / scale
    if meta.get("dtype") == "float32":
        return out.astype(np.float32)  # the exact expression _dec_verify32 pinned
    return out


# alp_float acceptance: at most this fraction of values may be exceptions
# (each costs pos int32 + raw value, so past ~1/16 the patch list erodes the
# integer-path win), and blocks below ALP_MIN_N can't amortize the section
# framing. The head-sample reject keeps truly-random blocks cheap.
ALP_MAX_EXC = 1.0 / 16.0
ALP_MIN_N = 64


def _alp_candidates(v: np.ndarray, k: int, dtype32: bool) -> tuple[np.ndarray, np.ndarray]:
    """(ints, exception_mask) for exponent k: positions whose int64 ->
    /10^k (-> float32 cast when dtype32) decode does NOT reproduce the
    original bits are exceptions; their int slot is zeroed so the patch
    list never widens the integer codec's range."""
    v64 = v.astype(np.float64) if dtype32 else v
    scale = float(10**k)
    with np.errstate(over="ignore", invalid="ignore"):
        scaled = v64 * scale
    finite = np.isfinite(scaled) & (np.abs(scaled) < _DEC_MAX_ABS)
    ints = np.zeros(v.size, dtype=np.int64)
    # np.rint = round-half-to-even, the same rule np.round applies at
    # decimals=0 (and a real ufunc, so where= masking works)
    np.rint(scaled, out=scaled, where=finite)
    ints[finite] = scaled[finite].astype(np.int64)
    decoded = ints.astype(np.float64) / scale
    if dtype32:
        exc = decoded.astype(np.float32).view(np.uint32) != v.view(np.uint32)
    else:
        exc = decoded.view(np.uint64) != v.view(np.uint64)
    exc |= ~finite
    ints[exc] = 0
    return ints, exc


def _alp_probe(v: np.ndarray) -> tuple[int, np.ndarray, np.ndarray] | None:
    """Best exponent by match count on a head sample (ties -> smallest k),
    verified by building the full-block exception mask; None when even the
    best sample exponent exceeds ALP_MAX_EXC (the cheap reject for truly
    non-decimal blocks — ~7 passes over 4096 values, like _dec_probe)."""
    if v.size < ALP_MIN_N:
        return None
    dtype32 = v.dtype.name == "float32"
    head = v[:_DEC_SAMPLE]
    rates = []
    for k in range(DEC_MAX_EXP + 1):
        _, exc = _alp_candidates(head, k, dtype32)
        rates.append(float(exc.mean()))
    k_best = int(np.argmin(rates))
    if rates[k_best] > ALP_MAX_EXC:
        return None
    ints, exc = _alp_candidates(v, k_best, dtype32)
    if float(exc.mean()) > ALP_MAX_EXC:
        return None
    return k_best, ints, exc


def encode_alp_float(values: np.ndarray) -> tuple[dict, bytes]:
    """ALP with its second half: dec_float's decimal-scaled integer path
    (Afroozeh & Boncz's ALP, VLDB 2023) plus PER-VALUE EXCEPTION PATCHING,
    so a block where 99% of values are prices and 1% are NaN sentinels or
    true reals still rides the integer codecs instead of falling all the
    way back to plain bytes. Exceptions store (int32 position, raw IEEE
    value) pairs — scattered over the decoded array, so the round trip is
    bit-identical for EVERY value including NaN payloads, -0.0, and inf.
    Raises :class:`EncodeValueError` when more than ALP_MAX_EXC of the
    block would be exceptions — callers treat that as 'use plain/bss',
    never as data loss."""
    name = values.dtype.name
    if name not in FLOAT_DTYPES:
        raise EncodeValueError("alp_float supports float32/float64 only")
    v = np.ascontiguousarray(values)
    probe = _alp_probe(v)
    if probe is None:
        raise EncodeValueError(
            "block exceeds the alp_float exception budget; use plain_float"
        )
    k, ints, exc = probe
    from xml2arrow_spark.codecs.integers import (  # lazy: avoid import cycle
        encode_dict,
        encode_delta,
        encode_for,
        encode_pdict,
        encode_pfor,
        encode_plain,
        encode_rle,
    )
    from xml2arrow_spark.plans.selector import choose_int_codec

    inner = choose_int_codec(ints)
    enc = {
        "plain": encode_plain, "for": encode_for, "delta": encode_delta,
        "rle": encode_rle, "dict": encode_dict, "pdict": encode_pdict,
        "pfor": encode_pfor,
        "bitpack": encode_for,  # FOR is always safe; bitpack needs >=0
    }[inner]
    int_meta, int_blob = enc(ints)
    pos = np.flatnonzero(exc).astype(np.int32)
    sections, blob = pack_sections(
        {
            "ints": int_blob,
            "exc_pos": pos.tobytes(),
            "exc_val": v[exc].tobytes(),
        }
    )
    return {
        "codec": "alp_float",
        "dtype": name,
        "n": int(v.size),
        "exp": k,
        "n_exc": int(pos.size),
        "int_meta": int_meta,
        "sections": sections,
    }, blob


def decode_alp_float(meta: dict, blob: bytes) -> np.ndarray:
    from xml2arrow_spark.codecs import decode_values

    parts = split_sections(meta, blob)
    ints = decode_values(meta["int_meta"], parts["ints"]).astype(np.int64)
    scale = float(10 ** meta["exp"])
    out = ints.astype(np.float64) / scale
    dt = FLOAT_DTYPES[meta["dtype"]]
    if meta["dtype"] == "float32":
        out = out.astype(np.float32)  # the exact expression the probe pinned
    if meta["n_exc"]:
        pos = np.frombuffer(parts["exc_pos"], dtype=np.int32, count=meta["n_exc"])
        vals = np.frombuffer(parts["exc_val"], dtype=dt, count=meta["n_exc"])
        out = out.copy()
        out[pos] = vals
    return out


def choose_float_codec(values: np.ndarray, cascade: str | None = None) -> str:
    """dec_float when the stream is exactly decimal, else plain_float — or
    bss_float when a ``+zstd``/``+lz4`` cascade follows and the bounded
    compression probe says byte-plane splitting beats the plain layout
    (true for dense float payloads like embeddings; see encode_bss_float).
    Without a cascade, bss is never chosen: alone it is a pure permutation
    with nothing to gain."""
    if values.dtype.name == "float64" and _dec_probe(values) is not None:
        return "dec_float"
    if values.dtype.name == "float32" and _dec_probe32(values) is not None:
        return "dec_float"
    # almost-decimal: the integer path with a bounded exception patch list
    # beats raw bytes long before a cascade enters the picture
    if _alp_probe(np.ascontiguousarray(values)) is not None:
        return "alp_float"
    if cascade and values.size and _bss_probe_wins(values, cascade):
        return "bss_float"
    return "plain_float"


def encode_bss_float(values: np.ndarray) -> tuple[dict, bytes]:
    """Byte-stream split: the n x itemsize byte matrix stored transposed, so
    byte plane k of every value is contiguous (Parquet's BYTE_STREAM_SPLIT
    encoding; also the Blosc "shuffle" filter). A pure permutation — zero
    size change and bit-identical round-trip by construction (NaN payloads,
    -0.0, inf included) — whose whole point is the ``+zstd``/``+lz4``
    cascade stage: IEEE floats drawn from one distribution share sign /
    exponent / high-mantissa structure per PLANE while interleaved bytes
    look random to an LZ window, so splitting turns an incompressible
    stream into a compressible one (measured ~0.6x plain+zstd on gaussian
    float32 embeddings). Never selected without a cascade suffix — alone it
    is plain_float plus a transpose."""
    name = values.dtype.name
    if name not in FLOAT_DTYPES:
        raise EncodeTypeError(f"unsupported float dtype: {name}")
    v = np.ascontiguousarray(values)
    n = int(v.size)
    isz = v.dtype.itemsize
    if n:
        planes = np.ascontiguousarray(v.view(np.uint8).reshape(n, isz).T)
        payload = planes.tobytes()
    else:
        payload = b""
    sections, blob = pack_sections({"planes": payload})
    return {
        "codec": "bss_float",
        "dtype": name,
        "n": n,
        "sections": sections,
    }, blob


def decode_bss_float(meta: dict, blob: bytes) -> np.ndarray:
    parts = split_sections(meta, blob)
    dt = np.dtype(FLOAT_DTYPES[meta["dtype"]])
    n = meta["n"]
    if n == 0:
        return np.zeros(0, dtype=dt)
    raw = np.frombuffer(parts["planes"], dtype=np.uint8, count=n * dt.itemsize)
    return (
        np.ascontiguousarray(raw.reshape(dt.itemsize, n).T)
        .view(dt)
        .reshape(n)
    )


# bounded probe for cascade-aware selection: compress this many bytes of the
# plain and byte-split layouts and compare (BtrBlocks-style sampled costing —
# compressing the whole block twice would cost more than the encode)
_BSS_PROBE_BYTES = 65536


def _bss_probe_wins(values: np.ndarray, cascade: str) -> bool:
    """True iff byte-stream-split + ``cascade`` compresses a bounded prefix
    of ``values`` smaller than the plain layout + ``cascade``. Deterministic
    (fixed prefix), so the manifest choice is reproducible run-to-run."""
    import pyarrow as pa

    isz = values.dtype.itemsize
    take = min(int(values.size), max(_BSS_PROBE_BYTES // isz, 1))
    if take < 64:
        return False  # too small for the frame overhead to amortize either way
    head = np.ascontiguousarray(values[:take])
    codec = pa.Codec(cascade)
    plain_c = len(codec.compress(head.tobytes(), asbytes=True))
    split = np.ascontiguousarray(head.view(np.uint8).reshape(take, isz).T)
    split_c = len(codec.compress(split.tobytes(), asbytes=True))
    return split_c < plain_c


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
