"""Continuous curation via Structured Streaming: a directory of row
batches (recrawls, re-tokenizations, quality re-scores) is MERGED into an
encoded dataset as it lands — ``foreachBatch`` over
:func:`~xml2arrow_spark.operators.checkpoint.upsert_rows`, the same
composition discipline as encode_stream (stateless batch-shaped transform;
no state store, no watermark).

Delivery contract, spelled out rather than pretended away:

- ``foreachBatch`` is AT-LEAST-ONCE — a crash between the sink write and
  the streaming-checkpoint commit replays the epoch. upsert_rows is
  replay-idempotent (replace-by-id), so a replayed epoch converges to the
  same dataset instead of double-applying.
- ACROSS epochs, later wins: the file source processes files in mtime
  order, and each epoch's upsert replaces the previous version of an id.
- WITHIN an epoch, there is no arrival order, and upsert_rows refuses
  duplicate ids (no defined winner). A merge stream therefore needs an
  explicit in-batch resolution rule: pass ``version_col`` and each id's
  greatest version wins (ties broken by a deterministic row fingerprint, so
  a replayed epoch picks the SAME winner); without it, duplicate ids in one
  micro-batch fail the stream loudly — the upstream producer must
  de-duplicate.

Reference analog: the reference's only update path is a whole-run rebuild
(/root/reference/src/xml_parser.rs:934-936); continuous merge is the
10^12-sequence generalization.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

__all__ = ["merge_stream", "run_merge_stream", "tombstone_stream"]


def merge_stream(
    spark: SparkSession,
    source_dir: str,
    dataset_path: str,
    schema_ddl: str,
    id_col: str = "doc_id",
    version_col: str | None = None,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int = 4,
):
    """Build a (not-yet-started) streaming writer: parquet dir -> MERGE
    into the encoded dataset at ``dataset_path`` (which must already exist
    — the stream updates a dataset, it does not bootstrap one).

    ``schema_ddl`` is the SOURCE schema: the dataset's encoded columns,
    plus ``version_col`` if given (the version is resolution metadata, not
    an encoded column — it is dropped after winner selection)."""
    import os

    from xml2arrow_spark.operators.checkpoint import upsert_rows

    src = (
        spark.readStream.schema(schema_ddl)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def _merge(batch_df, epoch_id: int) -> None:
        b = batch_df
        if version_col is not None:
            from pyspark.sql import Window

            data_cols = [c for c in b.columns if c != version_col]
            # greatest version per id wins; ties fall back to a row
            # fingerprint so winner selection is a pure function of the
            # batch CONTENTS (an epoch replay resolves identically)
            w = Window.partitionBy(id_col).orderBy(
                F.col(version_col).desc(),
                F.xxhash64(F.to_json(F.struct(*data_cols))).desc(),
            )
            b = (
                b.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .select(*data_cols)
            )
        upsert_rows(b, dataset_path, id_col=id_col)

    return (
        src.writeStream.foreachBatch(_merge)
        .option(
            "checkpointLocation",
            checkpoint_dir or os.path.join(dataset_path, "_merge_checkpoint"),
        )
        .trigger(availableNow=True)
    )


def tombstone_stream(
    spark: SparkSession,
    source_dir: str,
    dataset_path: str,
    id_col: str = "doc_id",
    id_type: str = "string",
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int = 4,
):
    """Continuous takedown feed: a directory of id batches (right-to-be-
    forgotten requests, moderation flags) soft-deletes rows as it lands —
    ``foreachBatch`` over :func:`~xml2arrow_spark.operators.tombstones.
    tombstone_rows`, the merge-on-read twin of :func:`merge_stream`.

    The delivery contract is the easiest of the three streams: tombstone
    writes are append-only and duplicate-INSENSITIVE, so at-least-once
    epoch replay needs no resolution rule at all — a replayed epoch lands
    redundant id rows that change nothing. Each batch costs O(batch)
    metadata; the periodic :func:`~xml2arrow_spark.operators.tombstones.
    apply_tombstones` fold (or any delete/upsert touching the same units)
    reclaims the payload bytes."""
    import os

    from xml2arrow_spark.operators.tombstones import tombstone_rows

    src = (
        spark.readStream.schema(f"{id_col} {id_type}")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def _tombstone(batch_df, epoch_id: int) -> None:
        # a concurrent lease holder (apply_tombstones / compaction /
        # upsert) must not FAIL the streaming query: the micro-batch is
        # replay-idempotent, so briefly retry for the lease instead of
        # surfacing LeaseHeldError (r06 / ADVICE r05)
        import time as _time

        from xml2arrow_spark.operators.lease import LeaseHeldError

        deadline = _time.time() + 15.0
        while True:
            try:
                tombstone_rows(batch_df, dataset_path, id_col=id_col)
                return
            except LeaseHeldError:
                if _time.time() >= deadline:
                    raise
                _time.sleep(0.25)

    return (
        src.writeStream.foreachBatch(_tombstone)
        .option(
            "checkpointLocation",
            checkpoint_dir
            or os.path.join(dataset_path, "_tombstone_checkpoint"),
        )
        .trigger(availableNow=True)
    )


def run_merge_stream(writer) -> None:
    """Start an availableNow merge and block until the source drains."""
    q = writer.start()
    q.awaitTermination()
