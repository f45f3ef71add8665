"""Lifecycle maintenance: the continuous takedown stream, snapshot
retention, and the debris vacuum."""

import os

from xml2arrow_spark.manifest import CodecManifest
from xml2arrow_spark.operators.checkpoint import (
    encode_dataset,
    read_encoded_dataset,
)
from xml2arrow_spark.operators.snapshot import (
    expire_snapshots,
    list_snapshots,
    snapshot_dataset,
    snapshot_path,
    vacuum,
)
from xml2arrow_spark.operators.tombstones import (
    apply_tombstones,
    pending_count,
)
from xml2arrow_spark.sources import tokens_dataframe


def _mk(spark, path, n=1500):
    df = tokens_dataframe(spark, n, variant="skewed_zipf", n_partitions=4).cache()
    man = CodecManifest.auto_for(df.schema, block_rows=512)
    encode_dataset(df, path, man, n_units=8)
    return df


def test_tombstone_stream_drains_and_replays_idempotently(spark, tmp_path):
    """A directory of takedown id batches soft-deletes as it lands; an
    epoch replay (fresh stream checkpoint over the same files) adds only
    duplicate id rows, which change nothing."""
    from xml2arrow_spark.streaming.merge_stream import (
        run_merge_stream,
        tombstone_stream,
    )

    path = str(tmp_path / "ds")
    df = _mk(spark, path)
    ids = [r["doc_id"] for r in df.select("doc_id").limit(10).collect()]
    src = str(tmp_path / "feed")
    os.makedirs(src)
    spark.createDataFrame([(i,) for i in ids[:6]], "doc_id string").coalesce(
        1
    ).write.mode("append").parquet(src)
    spark.createDataFrame([(i,) for i in ids[6:]], "doc_id string").coalesce(
        1
    ).write.mode("append").parquet(src)

    run_merge_stream(
        tombstone_stream(
            spark, src, path, checkpoint_dir=str(tmp_path / "ck1"),
            max_files_per_trigger=1,
        )
    )
    assert pending_count(path) == 10
    probe = spark.createDataFrame([(i,) for i in ids], "doc_id string")
    live = read_encoded_dataset(spark, path)
    assert live.join(probe, "doc_id", "left_semi").count() == 0

    # same-checkpoint re-run: nothing new to process (exactly-once epochs)
    run_merge_stream(
        tombstone_stream(
            spark, src, path, checkpoint_dir=str(tmp_path / "ck1")
        )
    )
    assert pending_count(path) == 10
    # fresh-checkpoint re-run = at-least-once replay of every epoch:
    # duplicate tombstone rows land, the pending set is unchanged
    run_merge_stream(
        tombstone_stream(
            spark, src, path, checkpoint_dir=str(tmp_path / "ck2")
        )
    )
    assert pending_count(path) == 10
    res = apply_tombstones(spark, path)
    assert res["rows_deleted"] == 10
    assert read_encoded_dataset(spark, path).count() == 1500 - 10
    df.unpersist()


def test_expire_snapshots_retention(spark, tmp_path):
    path = str(tmp_path / "ds")
    _mk(spark, path, n=300).unpersist()
    for i, tag in enumerate(["v1", "v2", "v3"]):
        snapshot_dataset(path, tag)
        # distinct creation times for the retain_last ordering
        os.utime(snapshot_path(path, tag), (1_000_000 + i, 1_000_000 + i))
    assert expire_snapshots(path) == []  # no policy: never mass-delete
    dropped = expire_snapshots(path, keep=["v1"], retain_last=1)
    assert dropped == ["v2"]  # v1 kept by name, v3 by recency
    assert list_snapshots(path) == ["v1", "v3"]


def test_vacuum_removes_debris_and_heals_torn_swap(spark, tmp_path):
    path = str(tmp_path / "ds")
    df = _mk(spark, path, n=300)
    snapshot_dataset(path, "keep")
    n_before = read_encoded_dataset(spark, path).count()

    # plant every debris class a crash can strand
    open(os.path.join(path, "_manifest.yaml.inprogress"), "w").write("torn")
    open(os.path.join(path, "manifest", "RESUME.tmp"), "w").write("torn")
    os.makedirs(os.path.join(path, ".rewrite_tmp", "x"))
    open(os.path.join(path, ".rewrite_tmp", "x", "part.parquet"), "w").write("t")
    os.makedirs(os.path.join(path, "snapshots", ".tmp-crashed"))
    open(
        os.path.join(path, "snapshots", ".tmp-crashed", "f.parquet"), "w"
    ).write("t")
    # a streaming checkpoint's own temp file must SURVIVE (Spark owns it)
    ckdir = os.path.join(path, "_merge_checkpoint", "offsets")
    os.makedirs(ckdir)
    keep_tmp = os.path.join(ckdir, "0.tmp")
    open(keep_tmp, "w").write("spark-owned")
    # torn manifest swap: old complete, new missing
    os.rename(
        os.path.join(path, "manifest"), os.path.join(path, "manifest.old")
    )

    rep = vacuum(path)
    assert rep["files_removed"] == 2  # .inprogress + RESUME.tmp
    assert rep["dirs_removed"] == 2  # .rewrite_tmp + snapshots/.tmp-crashed
    assert rep["bytes_reclaimed"] > 0
    assert os.path.exists(keep_tmp)  # checkpoint dir untouched
    assert os.path.isdir(os.path.join(path, "manifest"))  # swap healed
    assert not os.path.exists(os.path.join(path, "manifest.old"))
    assert list_snapshots(path) == ["keep"]  # durable snapshot untouched
    assert read_encoded_dataset(spark, path).count() == n_before
    df.unpersist()
