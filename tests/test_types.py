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
