"""Scalar conversion functions mirroring the reference's parse semantics.

The reference's boolean cast accepts a case-insensitive 12-token vocabulary
— ``true/false/1/0/yes/no/on/off/t/f/y/n`` — with ASCII-whitespace trim
(``parse_boolean_token``, /root/reference/src/xml_parser.rs:158-182). Spark's
native ``cast("boolean")`` accepts only a subset (t/f/y/n/yes/no/true/false/
0/1), rejects ``on``/``off``, so the full vocabulary is built as a Catalyst
``CASE`` chain — whole-stage-codegen'd, no UDF.

Strict integer parsing (full consumption, trailing garbage errors, overflow
errors — /root/reference/src/xml_parser.rs:200-240) maps to Spark's ANSI
mode (``spark.sql.ansi.enabled``, default ON in Spark 4): ``CAST('3x' AS
INT)`` raises ``CAST_INVALID_INPUT`` instead of yielding null. Use
``try_cast`` / :func:`parse_int` where the reference would map missing to
null instead.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["BOOL_TRUE_TOKENS", "BOOL_FALSE_TOKENS", "parse_boolean", "parse_int"]

# the reference's exact vocabulary (xml_parser.rs:158-182)
BOOL_TRUE_TOKENS = ["true", "1", "yes", "on", "t", "y"]
BOOL_FALSE_TOKENS = ["false", "0", "no", "off", "f", "n"]


def parse_boolean(col: Column | str, strict: bool = False) -> Column:
    """Case-insensitive 12-token boolean cast with whitespace trim.

    Non-vocabulary non-null input yields null (``strict=False``) or raises
    at execution (``strict=True`` — the reference's ParseError behavior for
    a non-nullable field)."""
    # btrim with an explicit set: Spark's trim() strips spaces only, but the
    # reference trims ALL ascii whitespace (xml_parser.rs:158-182)
    c = F.lower(
        F.btrim(F.col(col) if isinstance(col, str) else col, F.lit(" \t\r\n\x0b\x0c"))
    )
    out = (
        F.when(c.isin(BOOL_TRUE_TOKENS), F.lit(True))
        .when(c.isin(BOOL_FALSE_TOKENS), F.lit(False))
    )
    if strict:
        return out.otherwise(
            F.when(
                c.isNull(), F.lit(None).cast("boolean")
            ).otherwise(
                F.raise_error(
                    F.concat(F.lit("invalid boolean token: '"), c, F.lit("'"))
                ).cast("boolean")
            )
        )
    return out.otherwise(F.lit(None).cast("boolean"))


def parse_int(col: Column | str, dtype: str = "int", strict: bool = True) -> Column:
    """Full-consumption integer parse. ``strict=True`` relies on ANSI mode:
    trailing garbage ('3x') and overflow RAISE instead of silently yielding
    null/truncation — the reference's no-silent-truncation contract. With
    ``strict=False`` invalid input becomes null (``try_cast``)."""
    c = F.btrim(F.col(col) if isinstance(col, str) else col, F.lit(" \t\r\n\x0b\x0c"))
    if strict:
        return c.cast(dtype)
    return c.try_cast(dtype)
