"""Shared drain recipe for availableNow streaming operators: parquet
append sink + checkpoint under the output dir + blocking termination +
schema-pinned read-back. One copy, used by every stateful operator's
``run_*`` wrapper (a divergent trigger/checkpoint fix must not silently
miss a sibling)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["drain_available_now", "stage_ordered"]


def stage_ordered(chunks, src_dir: str) -> None:
    """Write each DataFrame chunk as one appended parquet file with
    STRICTLY INCREASING mtimes. The file stream source orders files by
    modification time (path as tiebreak), and rapid sequential writes can
    land in the same millisecond — explicit ``os.utime`` stamps make the
    replay order deterministic instead of disk-speed-dependent (ordered
    ingest is the contract several streaming gates/tests rely on)."""
    import glob
    import time

    t0 = time.time() - 3600  # firmly in the past; never ahead of new files
    for k, chunk in enumerate(chunks):
        before = set(glob.glob(os.path.join(src_dir, "*.parquet")))
        chunk.coalesce(1).write.mode("append").parquet(src_dir)
        for p in set(glob.glob(os.path.join(src_dir, "*.parquet"))) - before:
            os.utime(p, (t0 + k, t0 + k))


def drain_available_now(
    spark: SparkSession,
    stream_df: DataFrame,
    out_dir: str,
    out_ddl: str,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option(
            "checkpointLocation",
            checkpoint_dir or os.path.join(out_dir, "_stream_checkpoint"),
        )
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.schema(out_ddl).parquet(out_dir)
