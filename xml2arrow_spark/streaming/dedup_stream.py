"""Streaming exact dedup: a first-arrival filter over continuous ingestion
via ``applyInPandasWithState`` — the second custom stateful operator (the
sessionizer buffers and orders; this one is a keyed seen-set).

Each group key is the document text digest (md5); state is a single
``seen`` marker plus the winning doc id. The FIRST time a digest appears,
its winner row is emitted (append mode) — every later copy, in the same
micro-batch or any future one, is suppressed. Within one micro-batch the
winner is the minimum doc id of the batch's copies, so when the stream's
arrival order respects doc-id order (the gate stages range-partitioned
files; a production ingest replays append logs in order), the surviving
set is EXACTLY the batch ``exact_dedup`` keep-set (min id per distinct
text) — the property the oracle checks.

Scale shape: state per distinct document text is ~50 bytes (digest key +
id), the practical shape of continuous corpus-level dedup; no timeouts and
no watermark are needed because the decision is pure first-arrival (state
never needs to expire to be correct — pair an eviction TTL with the
downstream incremental MinHash pass when the corpus outgrows the store).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["dedup_stream", "run_dedup_stream"]

_OUT_DDL = "text_md5 string, keep_doc_id bigint"
_STATE_DDL = "keep_doc_id bigint"


def dedup_stream(
    spark: SparkSession,
    source_dir: str,
    schema_ddl: str = (
        "doc_id bigint, text string, source string, n_chars bigint"
    ),
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """Streaming DataFrame of first-arrival winners (text_md5,
    keep_doc_id), one row per distinct text, emitted in the micro-batch
    its first copy arrives."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs, state):
        import pandas as pd

        if state.exists:
            return  # digest already won: suppress every later copy
        best = None
        for pdf in pdfs:
            for d in pdf["doc_id"]:
                d = int(d)
                if best is None or d < best:
                    best = d
        if best is None:
            return
        state.update((best,))
        yield pd.DataFrame(
            [(key[0], best)], columns=["text_md5", "keep_doc_id"]
        )

    stream = (
        spark.readStream.schema(schema_ddl)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    keyed = stream.select(
        F.md5(F.col("text")).alias("text_md5"), "doc_id"
    )
    return keyed.groupBy("text_md5").applyInPandasWithState(
        fn, _OUT_DDL, _STATE_DDL, "append", GroupStateTimeout.NoTimeout
    )


def run_dedup_stream(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    schema_ddl: str = (
        "doc_id bigint, text string, source string, n_chars bigint"
    ),
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int = 4,
) -> DataFrame:
    """Drain the source availableNow into ``out_dir``; returns the winner
    rows."""
    from xml2arrow_spark.streaming.run import drain_available_now

    winners = dedup_stream(spark, source_dir, schema_ddl, max_files_per_trigger)
    return drain_available_now(spark, winners, out_dir, _OUT_DDL, checkpoint_dir)
