"""Writer-lease semantics: one live mutator per dataset tree, stale
leases stolen, failed mutations never brick the tree."""

import json
import os
import time

import pytest

from xml2arrow_spark.operators.lease import (
    LEASE_NAME,
    LeaseHeldError,
    dataset_lease,
)


def test_second_writer_refused_while_held(tmp_path):
    root = str(tmp_path / "ds")
    os.makedirs(root)
    with dataset_lease(root):
        with pytest.raises(LeaseHeldError, match="being mutated"):
            with dataset_lease(root):
                pass
    # released on exit: a new writer acquires immediately
    with dataset_lease(root):
        pass
    assert not os.path.exists(os.path.join(root, LEASE_NAME))


def test_release_on_exception(tmp_path):
    root = str(tmp_path / "ds")
    os.makedirs(root)
    with pytest.raises(RuntimeError, match="boom"):
        with dataset_lease(root):
            raise RuntimeError("boom")
    assert not os.path.exists(os.path.join(root, LEASE_NAME))


def _plant(root, **over):
    info = {
        "owner": "deadbeef", "pid": os.getpid(),
        "host": __import__("socket").gethostname(),
        "acquired_at": time.time(), "ttl_s": 3600.0,
    }
    info.update(over)
    with open(os.path.join(root, LEASE_NAME), "w") as f:
        f.write(json.dumps(info))


def test_stale_leases_are_stolen(tmp_path):
    root = str(tmp_path / "ds")
    os.makedirs(root)
    # dead pid on this host -> immediately stale
    _plant(root, pid=2**22 + 12345)
    with dataset_lease(root):
        pass
    # expired TTL -> stale regardless of host/pid
    _plant(root, acquired_at=time.time() - 100, ttl_s=1.0)
    with dataset_lease(root):
        pass
    # torn/unreadable lease (holder died mid-write) -> stale
    with open(os.path.join(root, LEASE_NAME), "w") as f:
        f.write("{not json")
    with dataset_lease(root):
        pass


def test_overrun_owner_does_not_release_the_stealers_lease(tmp_path):
    root = str(tmp_path / "ds")
    os.makedirs(root)
    with dataset_lease(root, ttl_s=0.05):
        time.sleep(0.1)  # overrun our own TTL
        with dataset_lease(root):  # stolen by the second writer
            pass  # second writer releases ITS lease on exit
        _plant(root, owner="thief")  # a live third party now holds it
    # the overrun first writer exited: the thief's lease must survive
    with open(os.path.join(root, LEASE_NAME)) as f:
        assert json.loads(f.read())["owner"] == "thief"


def test_mutations_hold_the_lease(spark, tmp_path):
    from xml2arrow_spark.manifest import CodecManifest
    from xml2arrow_spark.operators.checkpoint import delete_rows, encode_dataset
    from xml2arrow_spark.operators.tombstones import tombstone_rows
    from xml2arrow_spark.sources import tokens_dataframe

    path = str(tmp_path / "ds")
    df = tokens_dataframe(spark, 300, variant="skewed_zipf", n_partitions=2)
    encode_dataset(
        df, path, CodecManifest.auto_for(df.schema, block_rows=256), n_units=4
    )
    ids = df.select("doc_id").limit(3)
    with dataset_lease(path):  # a concurrent writer is mid-mutation
        with pytest.raises(LeaseHeldError):
            delete_rows(ids, path)
        with pytest.raises(LeaseHeldError):
            tombstone_rows(ids, path)
        with pytest.raises(LeaseHeldError):
            encode_dataset(
                df, path,
                CodecManifest.auto_for(df.schema, block_rows=256), n_units=4,
            )
    # writer done: the same mutations proceed
    m = tombstone_rows(ids, path)
    assert m["ids_tombstoned"] == 3
    m = delete_rows(ids, path)  # folds the tombstones it finds
    assert not os.path.exists(os.path.join(path, LEASE_NAME))


def test_two_threads_serialize_through_the_lease(spark, tmp_path):
    """Two genuinely concurrent writers (threads sharing the session) with
    wait_s: both succeed — the second blocks until the first releases —
    and the final state is both mutations applied (disjoint ids, so the
    serialization order is unobservable). Without the lease these could
    interleave on the shared staging dir and the manifest swap."""
    import threading

    from xml2arrow_spark.manifest import CodecManifest
    from xml2arrow_spark.operators import lease as L
    from xml2arrow_spark.operators.checkpoint import (
        delete_rows,
        encode_dataset,
        read_encoded_dataset,
        upsert_rows,
    )
    from xml2arrow_spark.sources import tokens_dataframe

    path = str(tmp_path / "ds")
    df = tokens_dataframe(spark, 600, variant="skewed_zipf", n_partitions=2).cache()
    encode_dataset(
        df, path, CodecManifest.auto_for(df.schema, block_rows=256), n_units=4
    )
    rows = df.limit(40).collect()
    doomed = [r["doc_id"] for r in rows[:10]]
    from pyspark.sql import functions as F

    batch = (
        df.filter(F.col("doc_id").isin([r["doc_id"] for r in rows[10:20]]))
        .withColumn("tokens", F.expr("slice(tokens, 1, 4)"))
        .withColumn("n_tok", F.expr("CAST(size(tokens) AS INT)"))
    )

    # make every mutation WAIT for the lease instead of refusing
    orig = L.dataset_lease
    patched = lambda p, ttl_s=L.DEFAULT_TTL_S, wait_s=0.0: orig(
        p, ttl_s=ttl_s, wait_s=60.0
    )
    L.dataset_lease = patched
    errs = []
    try:
        def run(fn):
            def go():
                try:
                    fn()
                except Exception as e:  # surfaced below — threads swallow
                    errs.append(e)
            return go

        t1 = threading.Thread(target=run(lambda: delete_rows(
            spark.createDataFrame([(d,) for d in doomed], "doc_id string"), path
        )))
        t2 = threading.Thread(target=run(lambda: upsert_rows(batch, path)))
        t1.start(); t2.start(); t1.join(120); t2.join(120)
    finally:
        L.dataset_lease = orig
    assert not errs, errs

    got = read_encoded_dataset(spark, path)
    assert got.count() == 600 - 10
    assert got.filter(got.doc_id.isin(doomed)).count() == 0
    short = got.join(batch.select("doc_id"), "doc_id", "left_semi")
    assert short.count() == 10
    assert short.filter("n_tok > 4").count() == 0  # the upsert's edit landed
    df.unpersist()


def test_file_dataset_sinks_hold_the_lease(spark, tmp_path):
    """encode_parquet_dataset (resume) and compact_dataset serialize
    through the same lease on out_path — two concurrent compactions
    racing the leftover sweep is the same unrepairable class."""
    from xml2arrow_spark.operators.dataset import (
        compact_dataset,
        encode_parquet_dataset,
    )
    from xml2arrow_spark.sources import tokens_dataframe

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    os.makedirs(out)
    tokens_dataframe(spark, 400, variant="skewed_zipf", n_partitions=4).write.parquet(src)
    with dataset_lease(out):
        with pytest.raises(LeaseHeldError):
            encode_parquet_dataset(spark, src, out)
    encode_parquet_dataset(spark, src, out)
    with dataset_lease(out):
        with pytest.raises(LeaseHeldError):
            compact_dataset(spark, out, target_files=2)
    m = compact_dataset(spark, out, target_files=2)
    assert m["files_after"] <= 2
    assert not os.path.exists(os.path.join(out, LEASE_NAME))
