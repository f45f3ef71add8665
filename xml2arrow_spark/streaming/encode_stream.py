"""Continuous encode via Structured Streaming.

The reference's "streaming" is single-pass constant-memory I/O over one
document (``BufRead``, /root/reference/src/xml_parser.rs:795) — not a
continuous query. The engine generalizes it to the real thing: new token
files landing in a directory are encoded incrementally, each micro-batch
running the same ``encode_table`` plan and appending blocks + manifest rows.
Exactly-once comes from the streaming checkpoint (source offsets) layered
over the engine's own unit manifest (idempotent re-encode on replay).

``foreachBatch`` is the right primitive: the encode is a stateless
batch-shaped transform — no watermarks or state stores needed — and it lets
every micro-batch share the resume/lineage code path with batch runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from xml2arrow_spark.manifest import CodecManifest
from xml2arrow_spark.operators.encode import encode_table

__all__ = ["encode_stream", "run_stream_once", "stream_metrics"]


def _append_batch_manifest(out_dir: str, epoch_id: int, rollup) -> None:
    """Per-micro-batch lineage row, appended driver-side with pyarrow (a
    Spark write job for one metadata row costs more than the micro-batch —
    the dataset-sink ground rule, see operators/dataset.py). The file name
    is EPOCH-DETERMINISTIC and written via hidden-tmp + rename: an epoch
    replay overwrites its own row instead of double-counting, and a crash
    mid-write can never leave a torn file at a discoverable name."""
    import pyarrow as pa

    from xml2arrow_spark.operators.metadata import append_rows

    append_rows(
        os.path.join(out_dir, "manifest"),
        [
            {
                "epoch_id": int(epoch_id),
                "n_blocks": int(rollup["n_blocks"] or 0),
                "n_rows": int(rollup["n_rows"] or 0),
                "n_values": int(rollup["n_values"] or 0),
                "in_bytes": int(rollup["in_bytes"] or 0),
                "out_bytes": int(rollup["out_bytes"] or 0),
            }
        ],
        pa.schema(
            [
                pa.field("epoch_id", pa.int64()),
                pa.field("n_blocks", pa.int64()),
                pa.field("n_rows", pa.int64()),
                pa.field("n_values", pa.int64()),
                pa.field("in_bytes", pa.int64()),
                pa.field("out_bytes", pa.int64()),
            ]
        ),
        f"epoch-{epoch_id:012d}.parquet",  # deterministic: replay overwrites
    )


def encode_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    manifest: CodecManifest,
    schema_ddl: str = "doc_id string, tokens array<int>, n_tok int, source string",
    checkpoint_dir: str | None = None,
):
    """Build a (not-yet-started) streaming query: parquet dir -> encoded
    blocks + a per-micro-batch lineage manifest (epoch_id keyed — the
    streaming twin of the batch sink's per-unit manifest).

    Effectively-once discipline: ``foreachBatch`` is AT-LEAST-ONCE — a
    crash between the sink write and the checkpoint commit replays the
    epoch — so both sinks are made IDEMPOTENT PER EPOCH instead of
    pretending otherwise: blocks land in ``blocks/epoch=<id>/`` with
    mode("overwrite") (a replay rewrites the same directory, never
    appends duplicates) and the lineage row's file name is
    epoch-deterministic (a replay overwrites its own row). Readers see
    ``epoch`` as a partition column; decode ignores it."""
    from pyspark.sql import functions as F

    stream = (
        spark.readStream.schema(schema_ddl)
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )

    def handle_batch(batch_df, epoch_id: int):
        blocks = encode_table(batch_df, manifest).persist()
        try:
            blocks.write.mode("overwrite").parquet(
                os.path.join(out_dir, "blocks", f"epoch={int(epoch_id)}")
            )
            rollup = blocks.agg(
                F.count("*").alias("n_blocks"),
                F.sum("n_rows").alias("n_rows"),
                F.sum("n_values").alias("n_values"),
                F.sum("in_bytes").alias("in_bytes"),
                F.sum("out_bytes").alias("out_bytes"),
            ).collect()[0]
        finally:
            blocks.unpersist()
        _append_batch_manifest(out_dir, epoch_id, rollup)

    writer = (
        stream.writeStream.foreachBatch(handle_batch)
        .option(
            "checkpointLocation",
            checkpoint_dir or os.path.join(out_dir, "_stream_checkpoint"),
        )
        .trigger(availableNow=True)
    )
    return writer


def stream_metrics(out_dir: str) -> dict:
    """Rollup of the streaming lineage manifest (driver-side pyarrow)."""
    from xml2arrow_spark.operators.metadata import sum_columns

    n, sums = sum_columns(
        os.path.join(out_dir, "manifest"),
        ["n_blocks", "n_rows", "n_values", "in_bytes", "out_bytes"],
    )
    return {
        "epochs": n,
        "blocks": sums["n_blocks"],
        "rows": sums["n_rows"],
        "values": sums["n_values"],
        "in_bytes": sums["in_bytes"],
        "out_bytes": sums["out_bytes"],
    }


def run_stream_once(writer) -> None:
    """Start an availableNow query and block until it drains the source."""
    q = writer.start()
    q.awaitTermination()
