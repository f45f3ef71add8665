"""recluster_dataset: clustering maintenance for stored file datasets —
the Iceberg rewrite_data_files(sort_order) analog. Decode -> globally
range-partitioned sorted staging -> fused re-encode with presort/zorder
into a NEW dataset directory (commit = the sidecar landing after the
data, the same order every sink uses; no in-place mutation, so there is
no crash window on the source).

Pins: multiset-identical rows after reclustering (incl. timestamps —
the staging write pins TIMESTAMP_MICROS so Spark's INT96 default cannot
change the storage tick unit); zone pruning appears after reclustering
an unclustered corpus (count_where telemetry: 0 pruned before, most
blocks pruned after); z-order reclustering makes a SECOND-axis predicate
prune; re-running into the same dest converges (encode resume)."""

from __future__ import annotations

import collections
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.pandas.types import from_arrow_schema

from xml2arrow_spark.manifest import CodecManifest
from xml2arrow_spark.operators.dataset import (
    count_where,
    decode_dataset,
    encode_parquet_dataset,
    recluster_dataset,
)

N = 6000


_ALL_IDS = np.random.default_rng(7).permutation(np.arange(3 * N)).astype(np.int64)


def _table(seed: int) -> pa.Table:
    # a slice of ONE global permutation: every file's id range spans the
    # whole domain, so zone maps prune NOTHING before reclustering
    ids = _ALL_IDS[seed * N:(seed + 1) * N]
    qty = (ids * 7919 % 1000).astype(np.int64)
    ts = pa.array(
        (1_700_000_000_000_000 + ids * 1_000_003).astype("datetime64[us]")
    )
    return pa.table({
        "id": pa.array(ids),
        "qty": pa.array(qty),
        "ts": ts,
        "tag": pa.array([f"t{int(i) % 5}" for i in ids]),
    })


@pytest.fixture(scope="module")
def src_ds(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("reclu"))
    src = os.path.join(base, "src")
    out = os.path.join(base, "ds")
    os.makedirs(src)
    for i in range(3):
        pq.write_table(_table(i), os.path.join(src, f"part-{i}.parquet"))
    manifest = CodecManifest.auto_for(
        from_arrow_schema(pq.read_schema(os.path.join(src, "part-0.parquet"))),
        block_rows=512,
    )
    encode_parquet_dataset(spark, src, out, manifest=manifest, layout="wide")
    return out


def _multiset(df):
    return collections.Counter(
        (r["id"], r["qty"], r["ts"], r["tag"]) for r in df.collect()
    )


def test_recluster_preserves_rows_and_creates_pruning(spark, src_ds, tmp_path):
    dest = str(tmp_path / "rc")
    before = _one_cw(spark, src_ds, ("id", 0, 600))
    assert before["n_pruned"] == 0  # ids are shuffled: nothing prunes

    m = recluster_dataset(spark, src_ds, dest, presort=["id"])
    assert m["n_files"] >= 1

    # bit-identical content (incl. the timestamp column: micros pinned)
    assert _multiset(decode_dataset(spark, dest)) == _multiset(
        decode_dataset(spark, src_ds)
    )
    after = _one_cw(spark, dest, ("id", 0, 600))
    assert after["n_match"] == before["n_match"]
    assert after["n_pruned"] > after["n_blocks"] // 2  # clustering bites
    # the recluster records its clustering in the sidecar
    import yaml

    with open(os.path.join(dest, "_manifest.yaml")) as f:
        side = yaml.safe_load(f.read())
    assert side.get("presort") == ["id"]


def _one_cw(spark, path, pred):
    return count_where(spark, path, pred).collect()[0].asDict()


def test_recluster_zorder_prunes_second_axis(spark, src_ds, tmp_path):
    dest = str(tmp_path / "rz")
    man = CodecManifest.auto_for(
        from_arrow_schema(_table(0).schema), block_rows=512
    )
    recluster_dataset(
        spark, src_ds, dest, presort=["id", "qty"], cluster="zorder",
        manifest=man,
    )
    assert _multiset(decode_dataset(spark, dest)) == _multiset(
        decode_dataset(spark, src_ds)
    )
    r = _one_cw(spark, dest, ("qty", 0, 60))
    assert r["n_pruned"] > 0  # the SECOND clustered axis prunes


def test_recluster_rerun_converges(spark, src_ds, tmp_path):
    dest = str(tmp_path / "rr")
    m1 = recluster_dataset(spark, src_ds, dest, presort=["id"])
    m2 = recluster_dataset(spark, src_ds, dest, presort=["id"])
    assert _multiset(decode_dataset(spark, dest)) == _multiset(
        decode_dataset(spark, src_ds)
    )
    assert m2["n_files"] == m1["n_files"]


def test_recluster_validation(spark, src_ds, tmp_path):
    with pytest.raises(ValueError, match="presort"):
        recluster_dataset(spark, src_ds, str(tmp_path / "rv"), presort=[])
    with pytest.raises(ValueError, match="lacks"):
        recluster_dataset(
            spark, src_ds, str(tmp_path / "rv2"), presort=["nope"]
        )


def test_recluster_drop_column(spark, src_ds, tmp_path):
    # the DROP COLUMN rewrite: reclustering with a projection leaves the
    # dropped column behind entirely
    dest = str(tmp_path / "rd")
    recluster_dataset(
        spark, src_ds, dest, presort=["id"], columns=["id", "qty"]
    )
    got = decode_dataset(spark, dest)
    assert set(got.columns) == {"id", "qty"}
    want = collections.Counter(
        (r["id"], r["qty"])
        for r in decode_dataset(spark, src_ds, columns=["id", "qty"]).collect()
    )
    assert collections.Counter((r["id"], r["qty"]) for r in got.collect()) == want
    with pytest.raises(ValueError, match="presort column"):
        recluster_dataset(
            spark, src_ds, str(tmp_path / "rd2"), presort=["id"],
            columns=["qty"],
        )


def test_vacuum_leaves_recluster_staging(spark, src_ds, tmp_path):
    """A crashed recluster's staged sort is RESUME state, not debris:
    deleting it between crash and re-run would let the re-stage sample
    different range boundaries against already-encoded units (tie rows
    could duplicate or vanish). vacuum must leave it untouched."""
    import shutil

    from xml2arrow_spark.operators.snapshot import vacuum

    dest = str(tmp_path / "vc")
    # simulate the crash window: staging complete, encode not started
    # (mirror the real staging write, incl. its TIMESTAMP_MICROS pin —
    # an INT96 staging would change the storage tick unit)
    staging = os.path.join(dest, "_recluster_src")
    df = decode_dataset(spark, src_ds)
    ts_key = "spark.sql.parquet.outputTimestampType"
    prior = spark.conf.get(ts_key)
    try:
        spark.conf.set(ts_key, "TIMESTAMP_MICROS")
        df.repartitionByRange(3, "id").sortWithinPartitions("id") \
            .write.mode("overwrite").parquet(staging)
    finally:
        spark.conf.set(ts_key, prior)
    assert os.path.exists(os.path.join(staging, "_SUCCESS"))
    # plant real debris beside it to prove the sweep still works
    open(os.path.join(dest, "stray.tmp"), "w").write("x")
    rep = vacuum(dest)
    assert rep["files_removed"] >= 1
    assert os.path.exists(os.path.join(staging, "_SUCCESS"))
    # the interrupted rewrite then completes off the SAME staging
    recluster_dataset(spark, src_ds, dest, presort=["id"], n_files=3)
    assert _multiset(decode_dataset(spark, dest)) == _multiset(
        decode_dataset(spark, src_ds)
    )
    assert not os.path.exists(staging)  # cleaned after the completed encode
    shutil.rmtree(dest, ignore_errors=True)
