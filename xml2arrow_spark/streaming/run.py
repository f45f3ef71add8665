"""Shared drain recipe for availableNow streaming operators: parquet
append sink + checkpoint under the output dir + blocking termination +
schema-pinned read-back. One copy, used by every stateful operator's
``run_*`` wrapper (a divergent trigger/checkpoint fix must not silently
miss a sibling)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["drain_available_now"]


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
