"""Continuous merge stream: staged micro-batches drive upsert_rows; the
drained dataset equals the batch-computed latest-wins truth."""

import os

from pyspark.sql import functions as F

from xml2arrow_spark.manifest import CodecManifest
from xml2arrow_spark.operators.checkpoint import (
    encode_dataset,
    read_encoded_dataset,
)
from xml2arrow_spark.operators.verify import verify_roundtrip
from xml2arrow_spark.sources import tokens_dataframe
from xml2arrow_spark.streaming.merge_stream import merge_stream, run_merge_stream
from xml2arrow_spark.streaming.run import stage_ordered

TOKENS_DDL = "doc_id string, tokens array<int>, n_tok int, source string"


def _truncated(df, n):
    return df.withColumn("tokens", F.expr(f"slice(tokens, 1, {n})")).withColumn(
        "n_tok", F.expr(f"CAST(size(tokens) AS INT)")
    )


def test_merge_stream_applies_epochs_in_order(spark, tmp_path):
    """Three staged micro-batches (replace, insert, replace-again) merge in
    mtime order: the final dataset equals base minus superseded versions
    plus the last version of every updated/inserted id."""
    base = tokens_dataframe(spark, 1200, variant="low_card", n_partitions=2).cache()
    path = str(tmp_path / "ds")
    encode_dataset(base, path, CodecManifest.auto_for(base.schema, block_rows=256), n_units=4)

    first = base.orderBy("doc_id").limit(30)
    epoch1 = _truncated(first, 8)                     # replace 30 docs
    epoch2 = first.limit(10).withColumn(              # insert 10 new ids
        "doc_id", F.concat("doc_id", F.lit("::s"))
    )
    epoch3 = _truncated(first.limit(12), 4)           # re-replace 12 of them

    src = str(tmp_path / "src")
    os.makedirs(src)
    stage_ordered([epoch1, epoch2, epoch3], src)
    # one file per trigger so each staged chunk is its own epoch (the two
    # replace epochs share ids — in one micro-batch they would collide)
    run_merge_stream(
        merge_stream(spark, src, path, TOKENS_DDL, max_files_per_trigger=1)
    )

    expect = (
        base.join(epoch1.select("doc_id"), "doc_id", "left_anti")
        .unionByName(epoch1.join(epoch3.select("doc_id"), "doc_id", "left_anti"))
        .unionByName(epoch3)
        .unionByName(epoch2)
    )
    assert verify_roundtrip(expect, read_encoded_dataset(spark, path))["ok"]

    # drain again with the same checkpoint: nothing new, nothing re-applied
    run_merge_stream(
        merge_stream(spark, src, path, TOKENS_DDL, max_files_per_trigger=1)
    )
    assert verify_roundtrip(expect, read_encoded_dataset(spark, path))["ok"]
    base.unpersist()


def test_merge_stream_in_batch_versions_resolve_latest_wins(spark, tmp_path):
    """One micro-batch carrying several versions of the same ids must
    resolve deterministically via version_col (greatest wins); without a
    version column, in-batch duplicates fail the stream loudly."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.sql.streaming import StreamingQueryException

    base = tokens_dataframe(spark, 600, variant="uniform_vocab", n_partitions=2).cache()
    path = str(tmp_path / "ds2")
    encode_dataset(base, path, CodecManifest.auto_for(base.schema, block_rows=256), n_units=4)

    some = base.orderBy("doc_id").limit(15)
    v1 = _truncated(some, 10).withColumn("v", F.lit(1))
    v2 = _truncated(some, 5).withColumn("v", F.lit(2))
    batch = v1.unionByName(v2)  # both versions in ONE file -> one epoch

    src = str(tmp_path / "src2")
    os.makedirs(src)
    stage_ordered([batch], src)
    run_merge_stream(
        merge_stream(
            spark, src, path, TOKENS_DDL + ", v int", version_col="v"
        )
    )
    expect = base.join(some.select("doc_id"), "doc_id", "left_anti").unionByName(
        _truncated(some, 5)
    )
    assert verify_roundtrip(expect, read_encoded_dataset(spark, path))["ok"]

    # no version column: the duplicate batch must fail the query, not pick
    # an arbitrary winner
    src3 = str(tmp_path / "src3")
    os.makedirs(src3)
    stage_ordered([batch.drop("v")], src3)
    with pytest.raises((StreamingQueryException, Py4JJavaError)):
        run_merge_stream(merge_stream(spark, src3, path, TOKENS_DDL))
    base.unpersist()
