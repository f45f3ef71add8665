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

__all__ = ["encode_stream", "run_stream_once"]


def encode_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    manifest: CodecManifest,
    schema_ddl: str = "doc_id string, tokens array<int>, n_tok int, source string",
    checkpoint_dir: str | None = None,
):
    """Build a (not-yet-started) streaming query: parquet dir -> encoded blocks."""
    stream = (
        spark.readStream.schema(schema_ddl)
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )

    def handle_batch(batch_df, epoch_id: int):
        blocks = encode_table(batch_df, manifest)
        blocks.write.mode("append").parquet(os.path.join(out_dir, "blocks"))

    writer = (
        stream.writeStream.foreachBatch(handle_batch)
        .option(
            "checkpointLocation",
            checkpoint_dir or os.path.join(out_dir, "_stream_checkpoint"),
        )
        .trigger(availableNow=True)
    )
    return writer


def run_stream_once(writer) -> None:
    """Start an availableNow query and block until it drains the source."""
    q = writer.start()
    q.awaitTermination()
