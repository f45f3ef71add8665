"""Merge-on-read tombstone deletes: O(batch) soft deletes staged as id
files, hidden by every read, folded by mutations/apply, refused by the
metadata-accelerated aggregates until folded."""

import glob
import os

import pytest

from xml2arrow_spark.manifest import CodecManifest
from xml2arrow_spark.operators.checkpoint import (
    completed_units,
    delete_rows,
    encode_dataset,
    lookup_rows,
    plan_units,
    read_encoded_dataset,
    upsert_rows,
)
from xml2arrow_spark.operators.tombstones import (
    apply_tombstones,
    has_pending,
    pending_count,
    pending_units,
    tombstone_rows,
)
from xml2arrow_spark.operators.verify import verify_roundtrip
from xml2arrow_spark.sources import tokens_dataframe


def _ids_df(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id string")


def _data_files(path):
    return set(
        glob.glob(os.path.join(path, "blocks", "**", "*.parquet"), recursive=True)
    )


def _mk(spark, path, n=2000, block_rows=512, n_units=8):
    df = tokens_dataframe(spark, n, variant="skewed_zipf", n_partitions=4).cache()
    man = CodecManifest.auto_for(df.schema, block_rows=block_rows)
    encode_dataset(df, path, man, n_units=n_units)
    return df


def test_tombstone_hides_rows_without_touching_payload(spark, tmp_path):
    """The cheap tier: a tombstone batch writes ZERO payload bytes (every
    block file's mtime is unchanged), yet read_encoded_dataset and
    lookup_rows hide the doomed rows immediately (merge-on-read)."""
    path = str(tmp_path / "t1")
    df = _mk(spark, path)
    doomed = [r["doc_id"] for r in df.select("doc_id").limit(40).collect()]
    mtimes = {f: os.path.getmtime(f) for f in _data_files(path)}

    m = tombstone_rows(_ids_df(spark, doomed), path)
    assert m["ids_tombstoned"] == 40
    assert m["affected_units"] >= 1
    assert has_pending(path) and pending_count(path) == 40

    # not a single payload byte rewritten
    assert {f: os.path.getmtime(f) for f in _data_files(path)} == mtimes

    expect = df.join(_ids_df(spark, doomed), "doc_id", "left_anti")
    assert verify_roundtrip(expect, read_encoded_dataset(spark, path))["ok"]

    # point reads: tombstoned id -> no row; live id -> its row
    live = [
        r["doc_id"]
        for r in expect.select("doc_id").limit(3).collect()
    ]
    got = lookup_rows(_ids_df(spark, doomed[:3] + live), path)
    assert sorted(r["doc_id"] for r in got.select("doc_id").collect()) == sorted(live)
    df.unpersist()


def test_apply_tombstones_folds_clears_and_replays(spark, tmp_path):
    """apply_tombstones = the maintenance fold: rows physically deleted,
    tombstone partitions cleared, lineage rollup updated; a replay (and a
    fold of absent ids) is a no-op."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "t2")
    df = _mk(spark, path)
    doomed = [r["doc_id"] for r in df.select("doc_id").limit(25).collect()]
    tombstone_rows(_ids_df(spark, doomed), path)

    res = apply_tombstones(spark, path)
    assert res["rows_deleted"] == 25
    assert not has_pending(path) and pending_count(path) == 0

    expect = df.join(_ids_df(spark, doomed), "doc_id", "left_anti")
    assert verify_roundtrip(expect, read_encoded_dataset(spark, path))["ok"]
    done = completed_units(spark, path)
    assert done.agg(F.sum("n_rows")).collect()[0][0] == 2000 - 25

    res2 = apply_tombstones(spark, path)  # nothing pending: no-op
    assert res2["rows_deleted"] == 0 and res2["affected_units"] == 0
    # tombstones for already-absent ids fold to zero deletions
    tombstone_rows(_ids_df(spark, doomed[:5]), path)
    res3 = apply_tombstones(spark, path)
    assert res3["rows_deleted"] == 0 and not has_pending(path)
    df.unpersist()


def test_mutations_fold_their_units_tombstones(spark, tmp_path):
    """delete_rows / upsert_rows rewrite affected units anyway, so they fold
    those units' pending tombstones in the same pass and clear the folded
    partitions — in particular an upsert RE-INSERTING a tombstoned id makes
    the new version visible. Other units' tombstones stay pending."""
    path = str(tmp_path / "t3")
    df = _mk(spark, path)
    rows = df.limit(200).collect()
    a, b = rows[0]["doc_id"], rows[1]["doc_id"]
    tombstone_rows(_ids_df(spark, [a, b]), path)
    unit_a = plan_units(_ids_df(spark, [a]), 8).collect()[0]["unit_id"]
    unit_b = plan_units(_ids_df(spark, [b]), 8).collect()[0]["unit_id"]

    # upsert a NEW version of the tombstoned id a
    new_a = (
        df.filter(df.doc_id == a)
        .withColumn("tokens", df.tokens)
        .withColumn("n_tok", df.n_tok)
    )
    upsert_rows(new_a, path)
    out = read_encoded_dataset(spark, path)
    assert out.filter(out.doc_id == a).count() == 1  # re-inserted: visible
    assert unit_a not in pending_units(path)  # folded + cleared
    if unit_b != unit_a:
        assert unit_b in pending_units(path)  # untouched unit: still pending
    assert out.filter(out.doc_id == b).count() == 0  # still hidden (MOR)

    # a delete in b's unit folds b's tombstone physically
    other = next(
        r["doc_id"] for r in rows[2:]
        if plan_units(_ids_df(spark, [r["doc_id"]]), 8).collect()[0]["unit_id"]
        == unit_b and r["doc_id"] != b
    )
    delete_rows(_ids_df(spark, [other]), path)
    assert unit_b not in pending_units(path)
    out = read_encoded_dataset(spark, path)
    assert out.filter(out.doc_id.isin([b, other])).count() == 0
    df.unpersist()


def test_stats_aggregates_refuse_pending_tombstones(spark, tmp_path):
    """count_where answers from block stats, which cannot see row-level
    deletes — it must refuse loudly while tombstones are pending and work
    again once folded."""
    from xml2arrow_spark.operators.dataset import count_where

    path = str(tmp_path / "t4")
    df = _mk(spark, path)
    doomed = [r["doc_id"] for r in df.select("doc_id").limit(10).collect()]
    tombstone_rows(_ids_df(spark, doomed), path)
    with pytest.raises(ValueError, match="pending tombstones"):
        count_where(spark, path, ("n_tok", 0, 10**6))
    apply_tombstones(spark, path)
    n = count_where(spark, path, ("n_tok", 0, 10**6)).collect()[0]["n_match"]
    assert n == 2000 - 10
    df.unpersist()


def test_snapshot_isolation_both_directions(spark, tmp_path):
    """A snapshot taken BEFORE a tombstone keeps showing the rows (soft
    deletes are not time travel); a snapshot taken AFTER carries the
    pending set (a frozen merge-on-read view)."""
    from xml2arrow_spark.operators.snapshot import snapshot_dataset, snapshot_path

    path = str(tmp_path / "t5")
    df = _mk(spark, path)
    doomed = [r["doc_id"] for r in df.select("doc_id").limit(8).collect()]
    snapshot_dataset(path, "before")
    tombstone_rows(_ids_df(spark, doomed), path)
    snapshot_dataset(path, "after")

    pre = read_encoded_dataset(spark, snapshot_path(path, "before"))
    post = read_encoded_dataset(spark, snapshot_path(path, "after"))
    live = read_encoded_dataset(spark, path)
    probe = _ids_df(spark, doomed)
    assert pre.join(probe, "doc_id", "left_semi").count() == 8
    assert post.join(probe, "doc_id", "left_semi").count() == 0
    assert live.join(probe, "doc_id", "left_semi").count() == 0
    df.unpersist()


def test_tombstone_batch_contracts(spark, tmp_path):
    """Empty batch = no-op; NULL ids refused; a replayed batch is
    idempotent (duplicate tombstone rows change nothing)."""
    path = str(tmp_path / "t6")
    df = _mk(spark, path)
    assert tombstone_rows(
        _ids_df(spark, []).limit(0), path
    ) == {"affected_units": 0, "ids_tombstoned": 0}
    with pytest.raises(ValueError, match="NULL"):
        tombstone_rows(_ids_df(spark, [None, "x"]), path)

    doomed = [r["doc_id"] for r in df.select("doc_id").limit(6).collect()]
    tombstone_rows(_ids_df(spark, doomed), path)
    tombstone_rows(_ids_df(spark, doomed), path)  # crash-replay of the batch
    assert pending_count(path) == 6  # distinct — duplicates are harmless
    expect = df.join(_ids_df(spark, doomed), "doc_id", "left_anti")
    assert verify_roundtrip(expect, read_encoded_dataset(spark, path))["ok"]
    res = apply_tombstones(spark, path)
    assert res["rows_deleted"] == 6
    df.unpersist()


def test_distributed_write_path_matches_driver_path(spark, tmp_path, monkeypatch):
    """Above DRIVER_WRITE_MAX_IDS the batch lands through the Spark
    partitioned sink; layout and read semantics are identical to the
    driver-side writer."""
    from xml2arrow_spark.operators import tombstones as T

    path = str(tmp_path / "t7")
    df = _mk(spark, path)
    doomed = [r["doc_id"] for r in df.select("doc_id").limit(12).collect()]
    monkeypatch.setattr(T, "DRIVER_WRITE_MAX_IDS", 4)
    m = tombstone_rows(_ids_df(spark, doomed), path)
    assert m["ids_tombstoned"] == 12
    assert pending_count(path) == 12
    expect = df.join(_ids_df(spark, doomed), "doc_id", "left_anti")
    assert verify_roundtrip(expect, read_encoded_dataset(spark, path))["ok"]
    res = apply_tombstones(spark, path)
    assert res["rows_deleted"] == 12 and not has_pending(path)
    df.unpersist()
