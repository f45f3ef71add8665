"""Continuous near-duplicate detection: Structured Streaming ingestion
driving the incremental MinHash signature store.

Each micro-batch of newly-ingested documents runs
:func:`~xml2arrow_spark.pipeline.dedup.lsh_near_dup_pairs_incremental`
against the shared ``sig_path`` store (append signatures as a fresh
epoch, band-join the batch against the partition-pruned bands table) and
lands its pair rows under ``out/pairs/epoch=<id>``.

Exactly-once shape (the encode_stream discipline): ``foreachBatch`` is
at-least-once, so every per-epoch effect is idempotent — the pairs
directory is OVERWRITTEN per epoch (a replay rewrites the same dir), and
a replayed signature append lands under a fresh epoch id whose rows the
store's latest-wins rule collapses.

Coverage invariant (what the gate checks): a pair is reported by exactly
the micro-batch that ingests its LATER side (both-in-one-batch pairs by
that batch), so the UNION of all epochs' pairs equals the batch
``lsh_near_dup_pairs`` output over the full corpus — continuous ingestion
is invisible to the result set.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["neardup_stream", "run_neardup_stream", "read_pairs"]

PAIRS_DDL = "doc_a bigint, doc_b bigint, inter_size int, union_size int"


def neardup_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    sig_path: str,
    schema_ddl: str = "doc_id bigint, text string, source string, n_chars bigint",
    threshold_milli: int = 800,
    max_cell: int | None = None,
    max_files_per_trigger: int = 4,
    checkpoint_dir: str | None = None,
):
    """Build the (not-yet-started) streaming writer."""
    from xml2arrow_spark.pipeline.dedup import lsh_near_dup_pairs_incremental

    stream = (
        spark.readStream.schema(schema_ddl)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def handle_batch(batch_df: DataFrame, epoch_id: int) -> None:
        pairs = lsh_near_dup_pairs_incremental(
            batch_df, sig_path,
            threshold_milli=threshold_milli, max_cell=max_cell,
        )
        pairs.write.mode("overwrite").parquet(
            os.path.join(out_dir, "pairs", f"epoch={int(epoch_id)}")
        )

    return (
        stream.writeStream.foreachBatch(handle_batch)
        .option(
            "checkpointLocation",
            checkpoint_dir or os.path.join(out_dir, "_stream_checkpoint"),
        )
        .trigger(availableNow=True)
    )


def read_pairs(spark: SparkSession, out_dir: str) -> DataFrame:
    """All epochs' pair rows (each pair appears in exactly one epoch)."""
    return (
        spark.read.schema(PAIRS_DDL)
        .option("basePath", os.path.join(out_dir, "pairs"))
        .parquet(os.path.join(out_dir, "pairs", "epoch=*"))
        .select("doc_a", "doc_b", "inter_size", "union_size")
    )


def run_neardup_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    sig_path: str,
    **kwargs,
) -> DataFrame:
    """Drain the source availableNow; returns the union of all epochs'
    pairs."""
    q = neardup_stream(spark, source_dir, out_dir, sig_path, **kwargs).start()
    q.awaitTermination()
    return read_pairs(spark, out_dir)
