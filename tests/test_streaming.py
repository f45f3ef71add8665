"""Structured Streaming encode: availableNow drain over a parquet directory."""

import os

from xml2arrow_spark.manifest import CodecManifest
from xml2arrow_spark.operators import decode_table
from xml2arrow_spark.operators.verify import verify_roundtrip
from xml2arrow_spark.sources import tokens_dataframe
from xml2arrow_spark.streaming import encode_stream, run_stream_once

TOKENS_DDL = "doc_id string, tokens array<int>, n_tok int, source string"


def test_stream_encode_drains_source(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    df = tokens_dataframe(spark, 2000, variant="low_card", n_partitions=2).cache()
    df.write.parquet(src)

    man = CodecManifest.auto_for(df.schema, block_rows=512)
    run_stream_once(encode_stream(spark, src, out, man, TOKENS_DDL))

    blocks = spark.read.parquet(os.path.join(out, "blocks"))
    decoded = decode_table(blocks, TOKENS_DDL)
    assert verify_roundtrip(df, decoded)["ok"]

    # second drain with no new files encodes nothing new (checkpoint offsets)
    n_before = blocks.count()
    run_stream_once(encode_stream(spark, src, out, man, TOKENS_DDL))
    assert spark.read.parquet(os.path.join(out, "blocks")).count() == n_before

    # new file arrives -> incremental encode picks up only the delta
    df2 = tokens_dataframe(spark, 500, variant="low_card", seed=43, n_partitions=1)
    df2.write.mode("append").parquet(src)
    run_stream_once(encode_stream(spark, src, out, man, TOKENS_DDL))
    total = decode_table(spark.read.parquet(os.path.join(out, "blocks")), TOKENS_DDL).count()
    assert total == 2500
    df.unpersist()


def test_stream_lineage_manifest(spark, tmp_path):
    """Each micro-batch appends one lineage row; the rollup matches what was
    actually encoded (the streaming twin of the batch sink's manifest)."""
    from xml2arrow_spark.streaming.encode_stream import stream_metrics

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    df = tokens_dataframe(spark, 1000, variant="low_card", n_partitions=4)
    df.write.parquet(src)
    man = CodecManifest.auto_for(df.schema, block_rows=256)
    run_stream_once(encode_stream(spark, src, out, man, TOKENS_DDL))
    m = stream_metrics(out)
    assert m["rows"] == 1000
    assert m["epochs"] >= 1
    assert m["blocks"] == spark.read.parquet(os.path.join(out, "blocks")).count()
    # a second drain adds no lineage (no new source files)
    run_stream_once(encode_stream(spark, src, out, man, TOKENS_DDL))
    assert stream_metrics(out)["rows"] == 1000
