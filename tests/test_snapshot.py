"""Dataset snapshots — frozen zero-copy views that survive every mutation
the engine can apply to the live tree."""

import os

from pyspark.sql import functions as F

from xml2arrow_spark.manifest import CodecManifest
from xml2arrow_spark.operators.checkpoint import (
    add_columns,
    audit_dataset,
    delete_rows,
    encode_dataset,
    lookup_rows,
    read_encoded_dataset,
    upsert_rows,
)
from xml2arrow_spark.operators.snapshot import (
    drop_snapshot,
    list_snapshots,
    snapshot_dataset,
    snapshot_path,
)
from xml2arrow_spark.operators.verify import verify_roundtrip
from xml2arrow_spark.sources import tokens_dataframe


def _encode(spark, tmp_path, n=2000):
    path = str(tmp_path / "ds")
    df = tokens_dataframe(spark, n, variant="low_card", n_partitions=4).cache()
    man = CodecManifest.auto_for(df.schema, block_rows=256)
    encode_dataset(df, path, man, n_units=4)
    return path, df


def test_snapshot_survives_delete_and_upsert(spark, tmp_path):
    path, df = _encode(spark, tmp_path)
    res = snapshot_dataset(path, "v1")
    assert res["files"] > 0 and res["linked"] == res["files"]  # zero-copy

    doomed = df.filter("doc_id LIKE '%3'").select("doc_id")
    delete_rows(doomed, path)
    batch = (
        df.filter("doc_id LIKE '%8'")
        .withColumn("tokens", F.expr("slice(tokens, 1, 4)"))
        .withColumn("n_tok", F.expr("CAST(size(tokens) AS INT)"))
    )
    upsert_rows(batch, path)

    # the snapshot still reads the PRE-mutation truth...
    snap = read_encoded_dataset(spark, snapshot_path(path, "v1"))
    assert verify_roundtrip(df, snap)["ok"]
    # ...while the live tree reads the post-mutation truth
    live_truth = (
        df.filter("doc_id NOT LIKE '%3' AND doc_id NOT LIKE '%8'")
        .unionByName(batch)
    )
    assert verify_roundtrip(live_truth, read_encoded_dataset(spark, path))["ok"]
    # both trees pass fsck (deep: CRC-verified decode of every block)
    assert all(t["ok"] for t in audit_dataset(spark, path, deep=True).values())
    assert all(
        t["ok"]
        for t in audit_dataset(spark, snapshot_path(path, "v1"), deep=True).values()
    )
    df.unpersist()


def test_snapshot_shares_inodes(spark, tmp_path):
    path, df = _encode(spark, tmp_path, n=500)
    snapshot_dataset(path, "pin")
    import glob

    live = sorted(glob.glob(os.path.join(path, "blocks", "**", "*.parquet"), recursive=True))
    snap = sorted(
        glob.glob(os.path.join(snapshot_path(path, "pin"), "blocks", "**", "*.parquet"), recursive=True)
    )
    assert len(live) == len(snap) > 0
    assert os.stat(live[0]).st_ino == os.stat(snap[0]).st_ino  # one inode, two names
    df.unpersist()


def test_snapshot_carries_families_and_bloom_index(spark, tmp_path):
    from xml2arrow_spark.operators.bloomidx import build_bloom_index, list_indexes

    path, df = _encode(spark, tmp_path)
    add_columns(
        df.filter("doc_id LIKE '%1'").select(
            "doc_id", (F.col("n_tok") % 7).cast("int").alias("score")
        ),
        path,
        "extra",
    )
    build_bloom_index(spark, path, "doc_id")
    snapshot_dataset(path, "full")
    sp = snapshot_path(path, "full")
    assert "doc_id" in list_indexes(sp)

    wanted = [r["doc_id"] for r in df.select("doc_id").limit(5).collect()]
    got = lookup_rows(
        spark.createDataFrame([(w,) for w in wanted], "doc_id string"),
        sp,
        columns=["doc_id", "n_tok", "score"],
    )
    expect = (
        df.join(
            spark.createDataFrame([(w,) for w in wanted], "doc_id string"),
            "doc_id",
            "left_semi",
        )
        .select(
            "doc_id",
            "n_tok",
            F.when(F.col("doc_id").like("%1"), (F.col("n_tok") % 7).cast("int")).alias("score"),
        )
    )
    assert verify_roundtrip(expect, got)["ok"]
    df.unpersist()


def test_snapshot_tags_and_lifecycle(spark, tmp_path):
    import pytest

    path, df = _encode(spark, tmp_path, n=500)
    snapshot_dataset(path, "a")
    snapshot_dataset(path, "b")
    assert list_snapshots(path) == ["a", "b"]
    with pytest.raises(ValueError):
        snapshot_dataset(path, "a")  # immutable names
    for bad in ("", ".hidden", "x/y"):
        with pytest.raises(ValueError):
            snapshot_dataset(path, bad)
    assert drop_snapshot(path, "a") and not drop_snapshot(path, "a")
    assert list_snapshots(path) == ["b"]
    # dropping a snapshot never harms the live tree
    assert read_encoded_dataset(spark, path).count() == 500
    # a fresh snapshot never includes older snapshots (no recursion)
    snapshot_dataset(path, "c")
    assert not os.path.exists(os.path.join(snapshot_path(path, "c"), "snapshots"))
    df.unpersist()
