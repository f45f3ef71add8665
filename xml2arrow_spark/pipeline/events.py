"""Event-stream operators over the driver's ``events`` table.

Sessionization is the canonical stateful training-data op: order each user's
events by time, cut a session whenever the gap exceeds a threshold, and roll
sessions up. Expressed with window functions (SURVEY §2.6's prescribed
primitive) — one shuffle on ``user_id``, running sums inside the partition,
no state store needed for the batch shape.

Everything stays in exact integer arithmetic (epoch seconds, counts) so the
DuckDB oracle matches value-for-value; ``value`` (double) is aggregated only
with order-independent min/max, never a float sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["sessionize", "event_type_stats"]

GAP_SECONDS = 1800  # 30-minute session gap

# tz-proof microsecond epoch for TIMESTAMP_NTZ: timestampdiff is pure
# calendar arithmetic, bit-identical in Spark and DuckDB (a session-timezone
# dependent cast would silently break oracle parity on non-UTC drivers).
_EPOCH_US = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"


def sessionize(events: DataFrame, gap_seconds: int = GAP_SECONDS) -> DataFrame:
    """(user_id, session_idx, n_events, t_start_us, t_end_us, dur_us) per
    session; timestamps as microsecond epochs (exact integers).

    ``session_idx`` is 0-based per user in time order; ordering ties break on
    ``event_id`` so the result is deterministic.
    """
    w = Window.partitionBy("user_id").orderBy("tse", "event_id")
    e = events.select("user_id", "event_id", F.expr(_EPOCH_US).alias("tse"))
    gap_us = gap_seconds * 1_000_000
    gapped = e.withColumn(
        "new_sess",
        F.when(F.col("tse") - F.lag("tse").over(w) > gap_us, 1).otherwise(0),
    )
    sess = gapped.withColumn(
        "session_idx", F.sum("new_sess").over(w).cast("bigint")
    )
    return (
        sess.groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.min("tse").alias("t_start_us"),
            F.max("tse").alias("t_end_us"),
        )
        .withColumn("dur_us", F.col("t_end_us") - F.col("t_start_us"))
    )


def event_type_stats(events: DataFrame) -> DataFrame:
    """Per event_type: counts, distinct users, exact value extrema
    (order-independent — no float accumulation order in the contract)."""
    return events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
