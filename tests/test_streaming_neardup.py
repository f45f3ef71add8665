"""Continuous near-dup detection: epoch union equals batch output, each
pair reported exactly once, per-epoch replay idempotent."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from xml2arrow_spark.pipeline import dedup
from xml2arrow_spark.streaming.neardup_stream import (
    read_pairs,
    run_neardup_stream,
)

DOCS_DDL = "doc_id bigint, text string, source string, n_chars bigint"
BOILER = "the quick brown fox jumps over the lazy dog again and again today"


def test_epoch_union_equals_batch_and_exactly_once(spark, tmp_path):
    # dups within one batch (1,2), across batches (3 in b1 ~ 4 in b2),
    # and across distant batches (1 in b1 ~ 9 in b3)
    t1 = BOILER + " one two three four five six seven"
    t2 = "another family of boilerplate words repeated here for the match test"
    rows = {
        0: [(1, t1), (2, t1), (3, t2)],
        1: [(4, t2), (5, "unique content " * 5)],
        2: [(9, t1)],
    }
    from xml2arrow_spark.streaming.run import stage_ordered

    src = str(tmp_path / "src")
    stage_ordered(
        [
            spark.createDataFrame(
                [(i, t, "s", len(t)) for i, t in rows[k]], DOCS_DDL
            )
            for k in range(3)
        ],
        src,
    )
    out = str(tmp_path / "out")
    sig = str(tmp_path / "sigs")
    got = run_neardup_stream(
        spark, src, out, sig, max_files_per_trigger=1
    )
    all_docs = spark.createDataFrame(
        [(i, t, "s", len(t)) for k in rows for i, t in rows[k]], DOCS_DDL
    )
    want = dedup.lsh_near_dup_pairs(all_docs)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    want._sig_cache.unpersist()
    # exactly-once: no pair appears in two epochs
    assert (
        got.groupBy("doc_a", "doc_b").count().filter("count > 1").count() == 0
    )
    # pairs land in the epoch of their LATER side
    by_pair = {}
    for d in glob.glob(os.path.join(out, "pairs", "epoch=*")):
        ep = int(d.split("epoch=")[1])
        for r in spark.read.parquet(d).collect():
            by_pair[(r.doc_a, r.doc_b)] = ep
    assert by_pair[(1, 2)] == 0 and by_pair[(3, 4)] == 1 and by_pair[(1, 9)] == 2

    # per-epoch replay idempotence: re-running epoch 2's effect (a crash
    # between the sink write and the checkpoint commit) rewrites the same
    # dir and appends a superseded signature epoch — results unchanged
    before = {tuple(r) for r in got.collect()}  # materialize pre-replay
    b2 = spark.createDataFrame(
        [(i, t, "s", len(t)) for i, t in rows[2]], DOCS_DDL
    )
    pairs = dedup.lsh_near_dup_pairs_incremental(b2, sig)
    pairs.write.mode("overwrite").parquet(
        os.path.join(out, "pairs", "epoch=2")
    )
    after = {tuple(r) for r in read_pairs(spark, out).collect()}
    assert after == before
