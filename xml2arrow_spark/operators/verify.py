"""Round-trip verification: decode(encode(df)) == df, bit-identical.

The distributed analog of the reference's ``assert_array_values!`` elementwise
round-trip assertions (/root/reference/src/xml_parser.rs:1424-1527): every
row's token array must equal the source array exactly (``array<int32>``
equality per ``doc_id``, per BASELINE.json), nulls and empty strings
distinguished.

Implemented as a sort-merge full-outer join on ``doc_id`` with
``IS DISTINCT FROM`` per column — null-safe, so a dropped row, an extra row,
a null-vs-empty swap, or a single token difference all count as mismatches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["roundtrip_mismatches", "verify_roundtrip"]


def roundtrip_mismatches(
    original: DataFrame, decoded: DataFrame, key: str = "doc_id"
) -> DataFrame:
    """Rows where any column differs (null-safe) between original and decoded."""
    cols = [c for c in original.columns if c != key]
    a, b = original.alias("a"), decoded.alias("b")
    joined = a.join(b, key, "full_outer")
    cond = None
    for c in cols:
        diff = F.col(f"a.{c}").eqNullSafe(F.col(f"b.{c}")) == F.lit(False)
        cond = diff if cond is None else (cond | diff)
    return joined.filter(cond).select(
        key, *[F.col(f"a.{c}").alias(f"a_{c}") for c in cols],
        *[F.col(f"b.{c}").alias(f"b_{c}") for c in cols]
    )


def verify_roundtrip(
    original: DataFrame, decoded: DataFrame, key: str = "doc_id"
) -> dict:
    """Counts + pass flag. One job; mismatch examples fetched only on failure."""
    n_orig = original.count()
    n_dec = decoded.count()
    n_bad = roundtrip_mismatches(original, decoded, key).count()
    return {
        "rows_original": n_orig,
        "rows_decoded": n_dec,
        "mismatches": n_bad,
        "ok": n_orig == n_dec and n_bad == 0,
    }
