"""Streaming exact dedup: first-arrival suppression across and within
micro-batches."""

from __future__ import annotations

from xml2arrow_spark.streaming.dedup_stream import run_dedup_stream

DOCS_DDL = "doc_id bigint, text string, source string, n_chars int"


def _stage(spark, tmp_path, name, batches):
    from xml2arrow_spark.streaming.run import stage_ordered

    src = str(tmp_path / name)
    stage_ordered(
        [spark.createDataFrame(rows, DOCS_DDL) for rows in batches], src
    )
    return src


def test_first_arrival_winner_across_batches(spark, tmp_path):
    b1 = [(5, "alpha", "s", 5), (9, "alpha", "s", 5), (7, "beta", "s", 4)]
    b2 = [(1, "alpha", "s", 5), (2, "gamma", "s", 5)]  # later copy: suppressed
    b3 = [(3, "beta", "s", 4)]                          # suppressed too
    src = _stage(spark, tmp_path, "src", [b1, b2, b3])
    got = {
        r.keep_doc_id
        for r in run_dedup_stream(
            spark, src, str(tmp_path / "out"), max_files_per_trigger=1
        ).collect()
    }
    # within-batch winner = min of the batch's copies (5 of {5,9});
    # across batches the FIRST batch's winner stands even though doc 1
    # arrives later with the same text — first-arrival semantics, exactly
    # what an ordered ingest log needs
    assert got == {5, 7, 2}


def test_streaming_matches_batch_rule_under_ordered_replay(spark, tmp_path, sf_dir):
    import os

    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    hi = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    src = str(tmp_path / "src2")
    step = (hi + 3) // 4
    for k in range(4):
        docs.filter(
            (F.col("doc_id") >= k * step) & (F.col("doc_id") < (k + 1) * step)
        ).coalesce(1).write.mode("append").parquet(src)
    got = run_dedup_stream(
        spark, src, str(tmp_path / "out2"), max_files_per_trigger=1
    )
    want = docs.groupBy(F.md5("text").alias("text_md5")).agg(
        F.min("doc_id").alias("keep_doc_id")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
