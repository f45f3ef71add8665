"""Cardinality sketches: KMV (k-minimum-values) distinct-count estimation.

The stats surface a 10^12-row engine plans with: exact ``COUNT(DISTINCT)``
over a wide table is a full shuffle of every distinct value; the KMV sketch
(Bar-Yossef et al., "Counting Distinct Elements in a Data Stream", RANDOM
2002) shuffles only hash VALUES and keeps k of them per group — error
~1/sqrt(k) (k=256 → ~6%). Chosen over HyperLogLog (Spark's
``approx_count_distinct``) deliberately: KMV is pure integer arithmetic
over a portable hash (`sqlgen.kmv_hash_expr`), so DuckDB reproduces the
ESTIMATE bit-for-bit and the driver gate can pin it — an HLL estimate is
engine-private. Below k distinct values the sketch is exact by
construction.

Scale shape: one (group, hash) dedup shuffle + one k-bounded window per
group — both distributed, no ``collect_set`` (unbounded executor memory),
no driver-side state. Reference analog: the per-table row/byte bookkeeping
the reference finalizes per RecordBatch (/root/reference/src/
xml_parser.rs:491-511), widened to a planning statistic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from xml2arrow_spark.pipeline import sqlgen as G

__all__ = ["kmv_distinct", "kmv_token_vocab", "KMV_K"]

KMV_K = 256


def _kmv_agg(pairs: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """(group, h) pairs -> one row per group with ``n_distinct_est``.

    ``pairs`` must already be distinct per (group, h); h values are distinct
    within a group, so the row_number order is total and deterministic."""
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= int(k))
        .groupBy(*group_cols)
        .agg(F.count("*").alias("n_h"), F.max("h").alias("h_k"))
        .select(
            *group_cols,
            F.expr(G.kmv_estimate_expr("n_h", "h_k", k, "spark")).alias(
                "n_distinct_est"
            ),
        )
    )


def kmv_distinct(df: DataFrame, cols: list[str], k: int = KMV_K) -> DataFrame:
    """Distinct-count estimate per column, ALL columns in one pass.

    Returns one row per column: ``(column, n_distinct_est)``. Columns are
    stacked into (column, h) pairs before the dedup, so adding columns adds
    map-side work, not jobs. Nulls are excluded (the SQL COUNT(DISTINCT)
    convention). Integer-typed columns only — the portable hash is integer
    arithmetic; hash string columns through a fingerprint fold first."""
    pairs = (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("column"),
                            F.expr(G.kmv_hash_expr(c, "spark")).alias("h"),
                        )
                        for c in cols
                    ]
                )
            ).alias("p")
        )
        .select("p.column", "p.h")
        .filter(F.col("h").isNotNull())
        .distinct()
    )
    return _kmv_agg(pairs, ["column"], k)


def kmv_token_vocab(tok: DataFrame, k: int = KMV_K) -> DataFrame:
    """Per-source vocabulary-size estimate over the token table: one row
    per source, ``n_vocab_est`` = KMV estimate of distinct token ids. The
    explode never leaves the map side — dedup happens on 8-byte
    (source, h) pairs, not token payloads."""
    pairs = (
        tok.select("source", F.explode("tokens").alias("t"))
        .select("source", F.expr(G.kmv_hash_expr("t", "spark")).alias("h"))
        .distinct()
    )
    return _kmv_agg(pairs, ["source"], k)
