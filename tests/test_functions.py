"""Scalar conversion parity with the reference (C1/C3 of SURVEY §2.3):
the 12-token boolean vocabulary (/root/reference/src/xml_parser.rs:158-182)
and ANSI strict-int casts (full consumption / overflow errors,
xml_parser.rs:200-240, 2560-2569)."""

import pytest
from pyspark.sql import functions as F

from xml2arrow_spark.functions import (
    BOOL_FALSE_TOKENS,
    BOOL_TRUE_TOKENS,
    parse_boolean,
    parse_int,
)


def test_vocabulary_is_the_reference_twelve():
    assert len(BOOL_TRUE_TOKENS) == 6 and len(BOOL_FALSE_TOKENS) == 6
    assert set(BOOL_TRUE_TOKENS) | set(BOOL_FALSE_TOKENS) == {
        "true", "false", "1", "0", "yes", "no", "on", "off", "t", "f", "y", "n"
    }


def test_parse_boolean_all_tokens_case_insensitive_trimmed(spark):
    rows = (
        [(t, True) for t in BOOL_TRUE_TOKENS]
        + [(t, False) for t in BOOL_FALSE_TOKENS]
        + [(t.upper(), t.lower() in BOOL_TRUE_TOKENS)
           for t in BOOL_TRUE_TOKENS + BOOL_FALSE_TOKENS]
        + [("  On  ", True), ("\tFALSE\t", False), ("maybe", None), (None, None)]
    )
    df = spark.createDataFrame(rows, "s string, expected boolean")
    got = df.select("expected", parse_boolean("s").alias("got")).collect()
    for r in got:
        assert r["got"] == r["expected"], r


def test_parse_boolean_strict_raises_on_garbage(spark):
    df = spark.createDataFrame([("yes",), ("junk",)], "s string")
    ok = df.filter("s = 'yes'").select(parse_boolean("s", strict=True)).collect()
    assert ok[0][0] is True
    with pytest.raises(Exception, match="invalid boolean token"):
        df.select(parse_boolean("s", strict=True).alias("b")).collect()


def test_ansi_strict_int_cast_trailing_garbage(spark):
    """The reference's full-consumption parse: '3x' is an error, never 3.
    Spark 4 ANSI mode provides exactly this contract."""
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    df = spark.createDataFrame([(" 42 ",), ("3x",)], "s string")
    ok = df.filter("s = ' 42 '").select(parse_int("s").alias("v")).collect()
    assert ok[0]["v"] == 42  # whitespace-trimmed, like the reference
    with pytest.raises(Exception, match="CAST_INVALID_INPUT|invalid input"):
        df.select(parse_int("s").alias("v")).collect()


def test_ansi_overflow_errors_not_truncates(spark):
    # 300 exceeds tinyint: ANSI raises (CAST_INVALID_INPUT for string
    # sources) instead of wrapping to 44 — the reference's overflow contract
    df = spark.createDataFrame([("300",)], "s string")
    with pytest.raises(Exception, match="CAST_INVALID_INPUT|CAST_OVERFLOW"):
        df.select(parse_int("s", "tinyint").alias("v")).collect()


def test_non_strict_yields_null(spark):
    df = spark.createDataFrame([("3x",), ("7",)], "s string")
    got = {r["s"]: r["v"] for r in df.select("s", parse_int("s", strict=False).alias("v")).collect()}
    assert got == {"3x": None, "7": 7}
