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


def test_tiered_state_plateaus_while_coverage_holds(spark, tmp_path):
    """VERDICT r04 #4: the tiered operator's keyed state is only the hot
    window — TTL eviction drains it between ingest waves — while the
    archival digest store keeps dedup coverage exact across evictions."""
    import time

    from xml2arrow_spark.streaming.dedup_stream import run_dedup_stream_tiered

    def rows(ids, texts):
        return [(i, t, "s", len(t)) for i, t in zip(ids, texts)]

    # wave 1: texts t00..t29 (30 distinct); wave 2 (after the TTL expires):
    # 10 REPEATS of t00..t09 with later ids + 10 new texts t30..t39
    wave1 = rows(range(30), [f"t{i:02d}" for i in range(30)])
    wave2 = rows(range(200, 220),
                 [f"t{i:02d}" for i in list(range(10)) + list(range(30, 40))])
    src = str(tmp_path / "src3")
    store = str(tmp_path / "store3")
    cp = str(tmp_path / "cp3")

    from xml2arrow_spark.streaming.run import stage_ordered

    stage_ordered([spark.createDataFrame(wave1, DOCS_DDL)], src)
    run_dedup_stream_tiered(
        spark, src, store, checkpoint_dir=cp, ttl_ms=200
    )
    time.sleep(1.0)  # let every wave-1 group's TTL expire
    stage_ordered([spark.createDataFrame(wave2, DOCS_DDL)], src)
    progress = []
    got = run_dedup_stream_tiered(
        spark, src, store, checkpoint_dir=cp, ttl_ms=200,
        progress_holder=progress,
    )

    # coverage: winners = first arrival per distinct text across BOTH waves
    # (the wave-2 repeats of t00..t09 were evicted from hot state, so only
    # the archival store can suppress them)
    winners = {r.text_md5: r.keep_doc_id for r in got.collect()}
    assert len(winners) == 40
    import hashlib

    for i in range(10):  # repeated texts keep their wave-1 winner
        assert winners[hashlib.md5(f"t{i:02d}".encode()).hexdigest()] == i
    for i in range(30, 40):  # new texts win with their wave-2 ids
        md5 = hashlib.md5(f"t{i:02d}".encode()).hexdigest()
        assert winners[md5] == 180 + i  # ids 200..219 zip t00..09,t30..39

    # plateau: after wave 2, state holds only wave-2 arrivals (<=20 groups),
    # NOT the 40 distinct digests the store tracks — eviction really drained
    # wave 1 from RAM
    state_rows = progress[-1]["stateOperators"][0]["numRowsTotal"]
    assert state_rows <= 20, state_rows
