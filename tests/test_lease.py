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
