"""Property-based round-trip tests: every integer codec must be bit-exact
on arbitrary inputs, including dtype extremes — the reference's
no-silent-truncation contract (/root/reference/src/xml_parser.rs:209-215)
checked over the whole input space rather than fixtures only."""

import numpy as np
from hypothesis import given, settings, strategies as st

from xml2arrow_spark.codecs import decode_values, encode_values

_DTYPES = [np.int8, np.int16, np.int32, np.int64]


def _arrays():
    return st.one_of(
        [
            st.lists(
                st.integers(np.iinfo(dt).min, np.iinfo(dt).max),
                min_size=0,
                max_size=300,
            ).map(lambda xs, dt=dt: np.array(xs, dtype=dt))
            for dt in _DTYPES
        ]
    )


def _roundtrip(codec, values):
    meta, blob = encode_values(codec, values)
    out = decode_values(meta, blob)
    assert out.dtype == values.dtype
    np.testing.assert_array_equal(out, values)


@settings(max_examples=150, deadline=None)
@given(_arrays())
def test_plain_for_rle_dict_delta_roundtrip(values):
    for codec in ("plain", "for", "rle", "dict", "delta"):
        _roundtrip(codec, values)


@settings(max_examples=100, deadline=None)
@given(_arrays())
def test_pdict_roundtrip(values):
    _roundtrip("pdict", values)


@settings(max_examples=100, deadline=None)
@given(_arrays())
def test_pfor_roundtrip(values):
    _roundtrip("pfor", values)


@settings(max_examples=80, deadline=None)
@given(
    st.lists(st.integers(0, 1000), min_size=1, max_size=300),
    st.lists(st.integers(2**40, 2**62), min_size=0, max_size=20),
    st.randoms(use_true_random=False),
)
def test_pfor_roundtrip_outlier_mixes(base, outliers, rnd):
    # the distribution pfor exists for: dense base + rare huge sentinels,
    # scattered at arbitrary positions
    vals = base + outliers
    rnd.shuffle(vals)
    _roundtrip("pfor", np.array(vals, dtype=np.int64))


def test_pfor_wins_on_value_outliers():
    """The selection motivation: one-in-a-hundred sentinel values force
    FOR's width from 10 bits to 31 while pfor patches them; pdict pays an
    avoidable dictionary table on the dense uniform base."""
    from xml2arrow_spark.plans.selector import choose_int_codec

    rng = np.random.default_rng(7)
    vals = np.where(
        rng.random(8192) < 0.01,
        rng.integers(10**9, 2 * 10**9, 8192),
        rng.integers(0, 1000, 8192),
    ).astype(np.int64)
    assert choose_int_codec(vals) == "pfor"
    _, blob = encode_values("pfor", vals)
    _, blob_for = encode_values("for", vals)
    _, blob_pdict = encode_values("pdict", vals)
    assert len(blob) < len(blob_for) / 2.5
    assert len(blob) < len(blob_pdict)
    _roundtrip("pfor", vals)


def test_pfor_not_chosen_without_outliers():
    # clean uniform data: pfor's plan degenerates to FOR's exact layout and
    # the tie goes to the simpler codec
    from xml2arrow_spark.plans.selector import choose_int_codec

    rng = np.random.default_rng(8)
    assert choose_int_codec(rng.integers(0, 1000, 8192).astype(np.int64)) == "for"


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(0, 2**31 - 1), min_size=0, max_size=300).map(
        lambda xs: np.array(xs, dtype=np.int64)
    )
)
def test_bitpack_roundtrip_nonnegative(values):
    _roundtrip("bitpack", values)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(-(2**62), 2**62),
        min_size=2,
        max_size=200,
    ).map(lambda xs: np.array(sorted(xs), dtype=np.int64))
)
def test_sorted_streams_roundtrip_all_codecs(values):
    # sorted streams are the delta-friendly case; every codec must still be
    # exact on them
    for codec in ("plain", "for", "rle", "dict", "pdict", "pfor", "delta"):
        _roundtrip(codec, values)


def test_delta_wins_on_sorted_timestamps():
    """The selection motivation: microsecond timestamps at ~1s cadence span
    a huge value range but a tiny delta range."""
    from xml2arrow_spark.plans.selector import choose_int_codec, estimate_int_sizes, int_stats

    rng = np.random.default_rng(3)
    ts = np.cumsum(rng.integers(900_000, 1_100_000, 50_000)) + 1_700_000_000_000_000
    ts = ts.astype(np.int64)
    est = estimate_int_sizes(int_stats(ts), itemsize=8)
    assert est["delta"] <= est["for"] / 2  # delta range ~18 bits vs value ~36
    assert choose_int_codec(ts) == "delta"
    _roundtrip("delta", ts)


def test_delta_not_chosen_on_unsorted():
    from xml2arrow_spark.plans.selector import choose_int_codec

    rng = np.random.default_rng(4)
    vals = rng.integers(0, 50_000, 20_000).astype(np.int32)
    assert choose_int_codec(vals) != "delta"  # unsorted: delta range ≈ 2x value range


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.sampled_from([0.0, -0.0, 1.5, float("inf"), float("-inf"), 3.14e300, 5e-324]),
        min_size=0,
        max_size=100,
    )
)
def test_plain_float_bit_identical(xs):
    values = np.array(xs, dtype=np.float64)
    meta, blob = encode_values("plain_float", values)
    out = decode_values(meta, blob)
    # bit-level comparison (NaN payloads + signed zeros must survive)
    np.testing.assert_array_equal(out.view(np.uint64), values.view(np.uint64))


# -- dec_float (ALP-style decimal-scaled doubles) ----------------------------


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(-(10**12), 10**12), min_size=0, max_size=200),
    st.integers(0, 4),
)
def test_dec_float_roundtrip_decimals(ints, k):
    values = np.array([i / 10**k for i in ints], dtype=np.float64)
    meta, blob = encode_values("dec_float", values)
    out = decode_values(meta, blob)
    np.testing.assert_array_equal(out.view(np.uint64), values.view(np.uint64))
    assert meta["exp"] <= k  # never over-scales


@settings(max_examples=80, deadline=None)
@given(st.lists(st.floats(allow_nan=True, allow_infinity=True), min_size=1, max_size=100))
def test_float_auto_path_always_bit_identical(xs):
    """Whatever the input — decimals, true reals, NaN payloads, ±inf,
    -0.0 — the auto float path must round-trip bit-identically (dec_float
    when eligible, plain_float fallback otherwise)."""
    import pyarrow as pa

    from xml2arrow_spark.operators.blocks import decode_column, encode_column

    values = np.array(xs, dtype=np.float64)
    arr = pa.array(values, type=pa.float64(), from_pandas=False)
    _, meta, blob = encode_column(arr, "auto")
    out = np.asarray(decode_column(meta, blob))
    np.testing.assert_array_equal(out.view(np.uint64), values.view(np.uint64))


def test_dec_float_rejects_non_decimals():
    from xml2arrow_spark.errors import EncodeValueError

    for bad in ([0.1 + 0.2], [float("nan")], [float("inf")], [-0.0], [3.141592653589793]):
        with __import__("pytest").raises(EncodeValueError):
            encode_values("dec_float", np.array(bad, dtype=np.float64))


def test_dec_float_compression_win_on_prices():
    """The motivating case: 2-decimal prices in a bounded range — 8
    bytes/value must drop by >2x via the scaled-int inner codec."""
    rng = np.random.default_rng(9)
    prices = np.round(rng.uniform(1, 2000, 60_000), 2)
    meta, blob = encode_values("dec_float", prices)
    assert meta["exp"] == 2
    assert len(blob) < prices.nbytes / 2
    out = decode_values(meta, blob)
    np.testing.assert_array_equal(out.view(np.uint64), prices.view(np.uint64))


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(0, 2**64 - 1), min_size=0, max_size=200).map(
        lambda xs: [__import__("decimal").Decimal(x) for x in xs]
    )
)
def test_decimal_uint64_column_roundtrip(vals):
    """The UInt64-widened decimal column path: arbitrary 0..2^64-1 values
    (including both sides of the int64 boundary in one block) round-trip
    bit-exactly through the uint64<->int64 bit-cast + integer codecs."""
    import pyarrow as pa

    from xml2arrow_spark.operators.blocks import decode_column, encode_column

    arr = pa.array(vals, type=pa.decimal128(20, 0))
    _, meta, blob = encode_column(arr, "auto")
    assert decode_column(meta, blob).equals(arr)


@settings(max_examples=80, deadline=None)
@given(
    st.lists(
        st.one_of(st.integers(0, 2**64 - 1), st.none()),
        min_size=1,
        max_size=120,
    )
)
def test_decimal_uint64_nullable_roundtrip(vals):
    import decimal

    import pyarrow as pa

    from xml2arrow_spark.operators.blocks import decode_column, encode_column

    arr = pa.array(
        [decimal.Decimal(v) if v is not None else None for v in vals],
        type=pa.decimal128(20, 0),
    )
    _, meta, blob = encode_column(arr, "auto")
    assert decode_column(meta, blob).equals(arr)


@settings(max_examples=120, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.floats(width=32, allow_nan=False, allow_infinity=False),
            st.integers(-(10**6), 10**6).map(lambda x: x / 100.0),
        ),
        min_size=0,
        max_size=300,
    ).map(lambda xs: np.array(xs, dtype=np.float32))
)
def test_float32_auto_roundtrip_bits(values):
    """Whatever codec 'auto' picks for a float32 block (dec_float when the
    block is exactly decimal, plain otherwise), decode must reproduce the
    float32 payload BIT-identically."""
    import pyarrow as pa

    from xml2arrow_spark.operators.blocks import decode_column, encode_column

    arr = pa.array(values)
    _, meta, blob = encode_column(arr, "auto")
    out = np.asarray(decode_column(meta, blob))
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out.view(np.uint32), values.view(np.uint32))


# -- general-entropy cascade: arbitrary columns round-trip bit-exactly ----------


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.integers(-(2**62), 2**62)),
        min_size=0, max_size=400,
    ),
    st.sampled_from(["zstd", "lz4"]),
)
def test_cascade_int_column_roundtrip(xs, general):
    import pyarrow as pa

    from xml2arrow_spark.operators.blocks import decode_column, encode_column

    arr = pa.array(xs, type=pa.int64())
    _, meta, payload = encode_column(arr, f"auto+{general}")
    assert decode_column(meta, payload).equals(arr)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.text(max_size=40)),
        min_size=0, max_size=300,
    ),
    st.sampled_from(["zstd", "lz4"]),
)
def test_cascade_str_column_roundtrip(xs, general):
    import pyarrow as pa

    from xml2arrow_spark.operators.blocks import decode_column, encode_column

    arr = pa.array(xs, type=pa.string())
    _, meta, payload = encode_column(arr, f"auto+{general}")
    assert decode_column(meta, payload).equals(arr)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200), st.text(max_size=200))
def test_zone_str_bounds_invariants(a, b):
    """For ANY two strings: the truncated lower bound never exceeds the
    true min, the bumped upper bound never undercuts the true max (or is
    withheld), both fit the cap, and no surrogate is ever emitted."""
    from xml2arrow_spark.operators.encode import _ZONE_STR_MAX, _zone_str_bounds

    lo, hi = (a, b) if a <= b else (b, a)
    lo_t, hi_t = _zone_str_bounds(lo, hi)
    assert lo_t <= lo and len(lo_t) <= _ZONE_STR_MAX
    if hi_t is not None:
        assert hi_t >= hi
        assert len(hi_t) <= _ZONE_STR_MAX
        assert all(not 0xD800 <= ord(c) <= 0xDFFF for c in hi_t)


@settings(max_examples=80, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.lists(
                st.floats(width=32, allow_nan=True, allow_infinity=True),
                max_size=24,
            ),
        ),
        max_size=120,
    )
)
def test_list_float32_roundtrip_bit_exact(rows):
    import numpy as np
    import pyarrow as pa

    from xml2arrow_spark.operators.blocks import decode_column, encode_column

    arr = pa.array(rows, type=pa.list_(pa.float32()))
    _, meta, payload = encode_column(arr, "auto")
    out = decode_column(meta, payload)
    assert out.is_valid().equals(arr.is_valid())
    a = np.asarray(arr.flatten()).view(np.uint32)
    b = np.asarray(out.flatten()).view(np.uint32)
    np.testing.assert_array_equal(a, b)  # bit-exact incl. NaN payloads/-0.0
    assert np.array_equal(
        np.asarray(arr.offsets, dtype=np.int64),
        np.asarray(out.offsets, dtype=np.int64),
    )


# -- bss_float (byte-stream split, the cascade-stage float layout) -----------


@settings(max_examples=80, deadline=None)
@given(
    st.lists(st.integers(0, 2**32 - 1), min_size=0, max_size=300),
    st.sampled_from(["float32", "float64"]),
)
def test_bss_float_bit_identical_on_arbitrary_bits(bits, dtype):
    """bss is a pure byte permutation: EVERY bit pattern — NaN payloads,
    denormals, ±inf, -0.0, garbage — must survive, in both widths."""
    u = np.array(bits, dtype=np.uint32)
    if dtype == "float64":
        values = (u.astype(np.uint64) << np.uint64(32) | u.astype(np.uint64)).view(
            np.float64
        )
    else:
        values = u.view(np.float32)
    meta, blob = encode_values("bss_float", values)
    out = decode_values(meta, blob)
    assert out.dtype == values.dtype
    itype = np.uint32 if dtype == "float32" else np.uint64
    np.testing.assert_array_equal(out.view(itype), values.view(itype))


def test_bss_probe_and_selection():
    """The cascade-aware chooser must (a) never pick bss without a cascade,
    (b) pick bss where byte-plane splitting measurably wins (reduced-
    precision embeddings: bf16-upcast float32 has two all-zero mantissa
    planes), (c) keep plain where bss LOSES (rounded-then-scaled float64,
    measured 1.2x worse split), and (d) keep dec_float on exact decimals
    regardless of cascade."""
    from xml2arrow_spark.codecs.floats import choose_float_codec

    rng = np.random.default_rng(11)
    bf16 = (
        (rng.normal(size=16384).astype(np.float32).view(np.uint32) & np.uint32(0xFFFF0000))
        .view(np.float32)
    )
    assert choose_float_codec(bf16) == "plain_float"  # (a) no cascade, no bss
    assert choose_float_codec(bf16, cascade="zstd") == "bss_float"  # (b)
    lowprec64 = np.round(rng.normal(size=16384), 4) * np.pi  # non-decimal
    assert choose_float_codec(lowprec64, cascade="zstd") == "plain_float"  # (c)
    decimals = rng.integers(0, 10**6, 16384).astype(np.float64) / 100.0
    assert choose_float_codec(decimals, cascade="zstd") == "dec_float"  # (d)


def test_bss_cascade_beats_plain_on_reduced_precision_block():
    """End-to-end block bytes: auto+zstd on bf16-upcast float32 lists must
    resolve to bss_float+zstd and come out smaller than the forced
    plain_float+zstd encode of the same block — the measured win the codec
    exists for."""
    import pyarrow as pa

    from xml2arrow_spark.operators.blocks import decode_column, encode_column

    rng = np.random.default_rng(13)
    flat = (
        (rng.normal(size=64 * 256).astype(np.float32).view(np.uint32) & np.uint32(0xFFFF0000))
        .view(np.float32)
    )
    rows = flat.reshape(64, 256).tolist()
    arr = pa.array(rows, type=pa.list_(pa.float32()))
    resolved, meta, payload = encode_column(arr, "auto+zstd")
    assert resolved == "bss_float+zstd"
    _, _, plain_payload = encode_column(arr, "plain_float+zstd")
    assert len(payload) < len(plain_payload)
    out = decode_column(meta, payload)
    np.testing.assert_array_equal(
        np.asarray(out.flatten()).view(np.uint32), flat.view(np.uint32)
    )


@settings(max_examples=60, deadline=None)
@given(
    st.data(),
    st.sampled_from(["auto", "auto+zstd"]),
)
def test_any_single_bit_flip_is_detected(data, codec):
    """Storage-integrity property (r05): flip ANY single bit at ANY position
    of a stored block payload and decode must raise BlockCorruptionError —
    CRC-32 detects all 1-bit errors by construction, so this holds for
    every position, not just sampled ones; hypothesis picks adversarial
    positions anyway."""
    import pyarrow as pa

    from xml2arrow_spark.errors import BlockCorruptionError
    from xml2arrow_spark.operators.blocks import decode_column, encode_column

    rows = data.draw(
        st.lists(
            st.lists(st.integers(-(2**31), 2**31 - 1), max_size=8),
            min_size=1,
            max_size=40,
        )
    )
    arr = pa.array(rows, type=pa.list_(pa.int32()))
    _, meta_json, blob = encode_column(arr, codec)
    if not blob:
        return  # nothing stored, nothing to rot
    pos = data.draw(st.integers(0, len(blob) * 8 - 1))
    flipped = bytearray(blob)
    flipped[pos // 8] ^= 1 << (pos % 8)
    try:
        out = decode_column(meta_json, bytes(flipped))
    except BlockCorruptionError:
        return
    raise AssertionError(
        f"bit {pos} flipped in a {len(blob)}-byte block decoded without "
        f"error (got {out.to_pylist()[:3]}...)"
    )


# -- alp_float (dec_float + per-value exception patching) ---------------------


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(-(10**9), 10**9), min_size=64, max_size=300),
    st.integers(0, 4),
    st.lists(
        st.sampled_from(
            [float("nan"), float("inf"), float("-inf"), -0.0, 3.141592653589793]
        ),
        min_size=0,
        max_size=16,
    ),
)
def test_alp_float_roundtrip_decimals_with_exceptions(ints, k, excs):
    """Decimal bulk + a bounded sprinkle of inexpressible values: the
    exception patch list must restore every bit (NaN payloads, signed
    zeros, true reals), and the exception count must equal the sprinkle."""
    values = np.array([i / 10**k for i in ints], dtype=np.float64)
    rng = np.random.default_rng(len(ints) * 31 + k)
    # stay safely inside the 1/16 exception budget at every size
    n_exc = min(len(excs), values.size // 32)
    pos = rng.choice(values.size, size=n_exc, replace=False)
    planted = list(zip(pos, excs))
    clean_at = {
        int(p) for p, e in planted
        if np.isfinite(e) and e != 3.141592653589793 and values[int(p)] == 0.0
    }
    for p, e in planted:
        values[int(p)] = e
    meta, blob = encode_values("alp_float", values)
    out = decode_values(meta, blob)
    np.testing.assert_array_equal(out.view(np.uint64), values.view(np.uint64))
    # -0.0 planted over a 0.0 slot is still an exception; every other
    # planted value must be too (they are non-decimal by construction)
    assert meta["n_exc"] >= len(set(int(p) for p in pos)) - len(clean_at) - 1


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(-(10**6), 10**6), min_size=64, max_size=300))
def test_alp_float32_roundtrip(ints):
    values = (np.array(ints, dtype=np.float64) / 10.0).astype(np.float32)
    values[0] = np.float32("nan")
    meta, blob = encode_values("alp_float", values)
    out = decode_values(meta, blob)
    np.testing.assert_array_equal(out.view(np.uint32), values.view(np.uint32))


def test_alp_float_rejects_past_exception_budget():
    from xml2arrow_spark.errors import EncodeValueError

    rng = np.random.default_rng(11)
    with __import__("pytest").raises(EncodeValueError):
        encode_values("alp_float", rng.standard_normal(10_000))  # all real
    # 20% NaN is past the 1/16 budget even though the bulk is decimal
    v = np.round(rng.uniform(0, 10, 10_000), 1)
    v[rng.choice(10_000, 2_000, replace=False)] = np.nan
    with __import__("pytest").raises(EncodeValueError):
        encode_values("alp_float", v)


def test_alp_float_wins_on_dirty_prices_and_auto_selects():
    """The motivating case dec_float CANNOT take: prices with a 1% NaN
    sentinel sprinkle. dec_float refuses the whole block; alp_float keeps
    the integer path (>2x under plain) and the auto chain picks it."""
    import pyarrow as pa

    from xml2arrow_spark.errors import EncodeValueError
    from xml2arrow_spark.operators.blocks import decode_column, encode_column

    rng = np.random.default_rng(13)
    prices = np.round(rng.uniform(1, 2000, 60_000), 2)
    prices[rng.choice(60_000, 600, replace=False)] = np.nan
    with __import__("pytest").raises(EncodeValueError):
        encode_values("dec_float", prices)
    meta, blob = encode_values("alp_float", prices)
    assert meta["exp"] == 2 and meta["n_exc"] == 600
    assert len(blob) < prices.nbytes / 2
    out = decode_values(meta, blob)
    np.testing.assert_array_equal(out.view(np.uint64), prices.view(np.uint64))

    arr = pa.array(prices, type=pa.float64(), from_pandas=False)
    resolved, cmeta, cblob = encode_column(arr, "auto")
    assert resolved == "alp_float"
    out2 = np.asarray(decode_column(cmeta, cblob))
    np.testing.assert_array_equal(out2.view(np.uint64), prices.view(np.uint64))
