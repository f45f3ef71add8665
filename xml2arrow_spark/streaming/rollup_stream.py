"""Streaming time-bucket rollup: the continuous twin of
:func:`xml2arrow_spark.operators.dataset.time_bucket_count`, built ENTIRELY
from Spark's native streaming primitives — ``withWatermark`` + a tumbling
``window()`` aggregation in append mode. No custom state: the built-in
windowed count is exactly this operator, so the engine uses it rather than
re-implementing it with applyInPandasWithState (the repo's stateful
operators exist only where the built-ins cannot express the semantics —
SURVEY §2.6).

Contract: events arrive in micro-batches with at most ``watermark_delay``
of event-time disorder; a bucket's row is emitted EXACTLY ONCE, as soon as
the watermark proves it closed (no within-delay late event can still join
it), carrying the same ``(bucket, bucket_start, cnt)`` the batch operator
computes — tumbling windows anchored at the epoch are exactly
``floor(ticks / width)`` buckets, so streaming output equals
``time_bucket_count`` over the same rows (pinned in
tests/test_streaming_rollup.py, late-arrival case included).

Scale shape: state = one count per OPEN bucket (bounded by
``watermark_delay / width`` + 1 per partition key-range, independent of
stream length — the watermark evicts every closed window); the shuffle
carries (window, partial count) pairs, map-side combined. At 10^12
events/day this is the shape a metrics rollup must have.

A stream never "ends": fully draining under ``availableNow`` requires
advancing the watermark past the last bucket — ingest a sentinel row
(``event_id = -1``) with an event time beyond ``last_real + delay +
width``; sentinel rows advance the watermark (the EventTimeWatermark node
sees them) but are filtered out BEFORE the aggregation, so no count is
perturbed (the sessionize stream's flush contract, reused). TWO sentinel
files are required, each its own micro-batch (``max_files_per_trigger=1``
— the file source coalesces epochs otherwise): Spark applies a batch's
observed max event time to the watermark of the NEXT batch, so the first
sentinel raises the watermark and the second forces the batch that emits
under it (``availableNow`` runs no empty cleanup batch for built-in
aggregations — the ProcessingTimeTimeout gotcha's windowed-agg cousin).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from xml2arrow_spark.streaming.sessionize_stream import EVENTS_DDL, FLUSH_EVENT_ID

__all__ = ["rollup_stream", "run_rollup_stream"]

_OUT_DDL = "bucket bigint, bucket_start bigint, cnt bigint"


def rollup_stream(
    spark: SparkSession,
    source_dir: str,
    width_seconds: int,
    watermark_delay: str = "0 seconds",
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """Streaming DataFrame of closed time buckets over the event files in
    ``source_dir``: ``(bucket, bucket_start, cnt)`` with epoch-anchored
    tumbling windows of ``width_seconds`` — bucket index semantics
    identical to ``time_bucket_count(column='ts',
    width=width_seconds * 1_000_000)``."""
    if width_seconds < 1:
        raise ValueError(f"width_seconds must be >= 1, got {width_seconds}")
    width_us = width_seconds * 1_000_000
    src = (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    # Sentinels must reach the EventTimeWatermark node: a plain
    # .filter(event_id != -1) above withWatermark gets PUSHED DOWN to the
    # parquet source (Catalyst moves it through the watermark node), the
    # sentinel file prunes at the scan, and the watermark never advances —
    # the stream drains nothing. Exclusion therefore happens INSIDE the
    # aggregate (conditional count) with a post-agg filter dropping the
    # sentinel-only windows; a filter above a stateful aggregation cannot
    # be pushed below it.
    return (
        src.withWatermark("ts", watermark_delay)
        .groupBy(F.window("ts", f"{width_seconds} seconds"))
        .agg(
            F.count(
                F.when(F.col("event_id") != F.lit(FLUSH_EVENT_ID), 1)
            ).alias("cnt")
        )
        .filter(F.col("cnt") > 0)
        .select(
            F.floor(
                F.unix_micros(F.col("window.start")) / F.lit(width_us)
            ).cast("long").alias("bucket"),
            F.unix_micros(F.col("window.start")).alias("bucket_start"),
            "cnt",
        )
    )


def run_rollup_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    width_seconds: int,
    watermark_delay: str = "0 seconds",
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """Drain the source with an availableNow query into ``out_dir`` and
    return the emitted bucket rows."""
    from xml2arrow_spark.streaming.run import drain_available_now

    buckets = rollup_stream(
        spark, source_dir, width_seconds, watermark_delay,
        max_files_per_trigger=max_files_per_trigger,
    )
    return drain_available_now(spark, buckets, out_dir, _OUT_DDL, checkpoint_dir)
