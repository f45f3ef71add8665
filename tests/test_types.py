"""Unsigned-width widening map — SURVEY §1.3 / reference
``as_arrow_type`` (/root/reference/src/config.rs:544-559): Spark has no
unsigned types, so each unsigned width widens to the next signed type that
holds its full range, and widened values round-trip bit-identically."""

import numpy as np
import pyarrow as pa
import pytest
from pyspark.sql import types as T

from xml2arrow_spark.errors import ManifestError
from xml2arrow_spark.operators.blocks import decode_column, encode_column
from xml2arrow_spark.types import DTYPES, RANGES, spark_type_for, widened_struct


def test_twelve_reference_primitives():
    assert len(DTYPES) == 12  # the reference's full DType enum


@pytest.mark.parametrize(
    "dtype,expected",
    [
        ("Boolean", T.BooleanType()),
        ("Int8", T.ByteType()),
        ("UInt8", T.ShortType()),
        ("Int16", T.ShortType()),
        ("UInt16", T.IntegerType()),
        ("Int32", T.IntegerType()),
        ("UInt32", T.LongType()),
        ("Int64", T.LongType()),
        ("UInt64", T.DecimalType(20, 0)),
        ("Float32", T.FloatType()),
        ("Float64", T.DoubleType()),
        ("Utf8", T.StringType()),
    ],
)
def test_widening_map(dtype, expected):
    assert spark_type_for(dtype) == expected


@pytest.mark.parametrize("dtype", ["UInt8", "UInt16", "UInt32"])
def test_widened_type_holds_full_range(dtype):
    lo, hi = RANGES[dtype]
    spark_t = spark_type_for(dtype)
    signed_bits = {T.ShortType(): 16, T.IntegerType(): 32, T.LongType(): 64}[spark_t]
    assert hi <= 2 ** (signed_bits - 1) - 1 and lo >= -(2 ** (signed_bits - 1))


@pytest.mark.parametrize(
    "dtype,arrow_t",
    [("UInt8", pa.int16()), ("UInt16", pa.int32()), ("UInt32", pa.int64())],
)
def test_widened_roundtrip_extremes(dtype, arrow_t):
    """Full-range unsigned values, widened, encode/decode bit-identical."""
    lo, hi = RANGES[dtype]
    vals = [lo, hi, hi - 1, lo + 1, (lo + hi) // 2]
    arr = pa.array(vals, type=arrow_t)
    _, meta, blob = encode_column(arr, "auto")
    assert decode_column(meta, blob).equals(arr)


def test_widened_struct_and_unknown_dtype():
    st = widened_struct({"a": "UInt16", "b": "Utf8"})
    assert [f.dataType for f in st.fields] == [T.IntegerType(), T.StringType()]
    with pytest.raises(ManifestError, match="unknown dtype"):
        spark_type_for("UInt128")


def test_uint64_widens_to_decimal_not_long():
    # 2^64-1 exceeds int64; the decimal mapping is the only lossless one
    lo, hi = RANGES["UInt64"]
    assert hi == 2**64 - 1
    assert spark_type_for("UInt64") == T.DecimalType(20, 0)
    assert np.iinfo(np.int64).max < hi


def test_uint64_decimal_roundtrip_extremes():
    """The full 0..2^64-1 range rides the integer-codec family as the low 64
    bits of decimal128 storage (the widening contract's last gap, VERDICT
    r02 #3): extremes, the int64 boundary, and nulls all round-trip."""
    from decimal import Decimal

    lo, hi = RANGES["UInt64"]
    vals = [lo, hi, 2**63 - 1, 2**63, 2**63 + 1, 12345, None, hi - 1]
    arr = pa.array(
        [Decimal(v) if v is not None else None for v in vals],
        type=pa.decimal128(20, 0),
    )
    _, meta, blob = encode_column(arr, "auto")
    assert decode_column(meta, blob).equals(arr)


def test_uint64_decimal_out_of_range_rejected():
    from decimal import Decimal

    from xml2arrow_spark.errors import EncodeValueError

    for bad in (-1, 2**64):
        arr = pa.array([Decimal(bad)], type=pa.decimal128(21, 0))
        with pytest.raises(EncodeValueError, match=r"outside \[0, 2\^64\)"):
            encode_column(arr, "auto")


def test_all_twelve_dtypes_spark_roundtrip(spark):
    """Every reference DType, widened per types.py, through
    encode_table -> decode_table at full-range values — the end-to-end
    proof the widening map promises (/root/reference/src/config.rs:544-559)."""
    from decimal import Decimal

    from xml2arrow_spark.manifest import CodecManifest
    from xml2arrow_spark.operators.encode import decode_table, encode_table

    cols = {f"c_{d.lower()}": d for d in DTYPES}
    rows = []
    for i in range(3):
        row = {}
        for name, d in cols.items():
            rng = RANGES[d]
            if d == "Boolean":
                row[name] = i % 2 == 0
            elif d == "Float32":
                row[name] = [3.5, -2.0, 0.0][i]
            elif d == "Float64":
                row[name] = [2.718281828459045, -1e300, 5e-324][i]
            elif d == "Utf8":
                row[name] = ["", "héllo", "x" * 100][i]
            elif d == "UInt64":
                row[name] = Decimal([0, 2**64 - 1, 2**63][i])
            else:
                row[name] = [rng[0], rng[1], (rng[0] + rng[1]) // 2][i]
        rows.append(row)
    schema = widened_struct(cols)
    df = spark.createDataFrame(rows, schema)
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)
    man = CodecManifest.auto_for(df.schema, block_rows=4)
    out = decode_table(encode_table(df, man), ddl)
    got = {tuple(repr(v) for v in r) for r in out.collect()}
    want = {tuple(repr(r[f.name]) for f in schema.fields) for r in df.collect()}
    assert got == want
