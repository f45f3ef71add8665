"""Explicit partitioning for encode-work balance: n_tok range buckets + skew salting.

The reference is single-threaded, so balance is our problem alone. The north
rule demands *explicit* handling (not AQE-only):

- ``repartition_by_work``: rows are ragged (1..8192 tokens); balancing on row
  COUNT would leave token-count skew, so we bucket by ``n_tok`` and
  range-partition on (bucket, salt). The salt spreads the giant head bucket
  (``source='src0'`` is ~60% of rows in the fixture) across many tasks.
- ``salt_skewed``: generic salting helper for skewed key joins/aggregations.

Both are pure DataFrame ops — Catalyst sees through them, and AQE can still
coalesce on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["with_work_bucket", "repartition_by_work", "salt_skewed", "explain_partitioning"]


def with_work_bucket(df: DataFrame, n_tok_col: str = "n_tok", n_buckets: int = 8) -> DataFrame:
    """Add ``work_bucket`` = log2-scaled n_tok bucket (0..n_buckets-1).

    Log-scale because n_tok is log-normal (FIXTURES.md F1): linear buckets
    would put almost everything in bucket 0. floor(log2(n)) is computed as
    ``length(bin(n)) - 1`` — exact integer arithmetic (float log2 can return
    2.9999... for powers of two and disagree across engines/oracles).
    """
    bits = F.length(F.bin(F.greatest(F.col(n_tok_col).cast("bigint"), F.lit(1)))) - 1
    return df.withColumn(
        "work_bucket",
        F.least(bits.cast("int"), F.lit(n_buckets - 1)),
    )


def repartition_by_work(
    df: DataFrame,
    n_partitions: int,
    n_tok_col: str = "n_tok",
    salt_buckets: int = 16,
) -> DataFrame:
    """Range-partition by (work_bucket, salt) so each task gets a similar
    token budget, not just a similar row count.

    The salt is a deterministic hash of doc_id (reproducible runs — same
    placement every run, which the checkpoint/resume story depends on), not
    ``rand()``.
    """
    bucketed = with_work_bucket(df, n_tok_col)
    salted = bucketed.withColumn(
        "salt", F.pmod(F.xxhash64("doc_id"), F.lit(salt_buckets)).cast("int")
    )
    out = salted.repartitionByRange(n_partitions, "work_bucket", "salt")
    return out.drop("work_bucket", "salt")


def salt_skewed(
    df: DataFrame,
    key_col: str,
    skewed_values: list[str],
    n_salts: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Add ``salted_key`` = key for normal values, key#<salt> for skewed ones.

    Aggregations then run in two stages: partial on salted_key, final on key —
    the classic skew-salting pattern the north rule calls for.
    """
    is_skewed = F.col(key_col).isin(skewed_values)
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts)).cast("string")
    return df.withColumn(
        "salted_key",
        F.when(is_skewed, F.concat_ws("#", F.col(key_col), salt)).otherwise(
            F.col(key_col)
        ),
    )


def detect_skewed_keys(df: DataFrame, key_col: str, threshold: float = 0.2) -> list[str]:
    """Keys holding more than ``threshold`` of rows (one small agg job)."""
    total = df.count()
    if total == 0:
        return []
    counts = df.groupBy(key_col).count()
    rows = counts.filter(F.col("count") > threshold * total).collect()
    return [r[key_col] for r in rows]


def explain_partitioning(df: DataFrame) -> str:
    """Formatted physical plan — for plan audits in tests/benchmarks."""
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
