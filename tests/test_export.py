"""Training-shard export (operators/export.py): the curated slice leaves
the engine as deterministic parquet shards whose manifest is recomputable
evidence — shard membership and training order are pure functions of the
id, the verification pass attests what is ON DISK, and any dropped /
duplicated / reordered row after the fact is a verify_export finding."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from xml2arrow_spark.operators.dataset import decode_dataset, encode_parquet_dataset
from xml2arrow_spark.operators.export import (
    export_slice,
    read_export,
    verify_export,
)

N = 600


def _src_table() -> pa.Table:
    ids = np.arange(N, dtype=np.int64)
    return pa.table(
        {
            "doc_id": pa.array(ids),
            "n_tok": pa.array((ids % 97).astype(np.int64)),
            "source": pa.array([f"s{i % 3}" for i in ids]),
        }
    )


@pytest.fixture(scope="module")
def ds(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("exp"))
    src = os.path.join(base, "src")
    out = os.path.join(base, "ds")
    os.makedirs(src)
    pq.write_table(_src_table(), os.path.join(src, "part-0.parquet"))
    encode_parquet_dataset(spark, src, out, layout="wide")
    return out


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def test_roundtrip_manifest_and_verify(spark, ds, tmp_path):
    dest = str(tmp_path / "out")
    man = export_slice(spark, ds, dest, id_col="doc_id", n_shards=5)
    assert man["n_rows"] == N
    assert {s["shard"] for s in man["shards"]} <= set(range(5))
    got = read_export(spark, dest)
    want = decode_dataset(spark, ds)
    cols = ["doc_id", "n_tok", "source"]
    assert _rows(got, cols) == _rows(want, cols)
    rep = verify_export(spark, dest)
    assert rep["ok"], rep["findings"]
    assert rep["n_rows"] == N


def test_deterministic_layout_and_order(spark, ds, tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    ma = export_slice(spark, ds, a, id_col="doc_id", n_shards=7)
    mb = export_slice(spark, ds, b, id_col="doc_id", n_shards=7)
    assert ma["shards"] == mb["shards"]
    cols = ["doc_id", "shard", "pos"]
    assert _rows(read_export(spark, a), cols) == _rows(read_export(spark, b), cols)


def test_order_matches_shuffle_order_truth(spark, ds, tmp_path):
    from xml2arrow_spark.pipeline.sampling import shuffle_order

    dest = str(tmp_path / "out")
    export_slice(spark, ds, dest, id_col="doc_id", n_shards=4)
    truth = shuffle_order(
        decode_dataset(spark, ds), n_shards=4, id_col="doc_id"
    )
    cols = ["doc_id", "shard", "pos"]
    assert _rows(read_export(spark, dest), cols) == _rows(truth, cols)


def test_physical_file_order_is_pos_order(spark, ds, tmp_path):
    """A training loader streams shard files sequentially: rows must sit
    in the files in pos order (the plan relies on the rank window's
    within-partition sort reaching the sink unchanged — a re-sort or
    added exchange would scramble it silently)."""
    dest = str(tmp_path / "out")
    export_slice(spark, ds, dest, id_col="doc_id", n_shards=3)
    checked = 0
    for d in sorted(os.listdir(dest)):
        if not d.startswith("shard="):
            continue
        for fn in sorted(os.listdir(os.path.join(dest, d))):
            if not fn.endswith(".parquet"):
                continue
            pos = pq.read_table(
                os.path.join(dest, d, fn), columns=["pos"]
            ).column("pos").to_pylist()
            assert pos == sorted(pos)
            checked += len(pos)
    assert checked == N


def test_filters_compose_and_id_autoincluded(spark, ds, tmp_path):
    dest = str(tmp_path / "out")
    man = export_slice(
        spark, ds, dest, id_col="doc_id", columns=["n_tok"],
        zone_filter=("doc_id", 100, 299), row_filter=("doc_id", 100, 299),
        n_shards=3,
    )
    got = read_export(spark, dest)
    assert set(got.columns) == {"n_tok", "doc_id", "pos", "shard"}
    assert man["n_rows"] == 200
    assert sorted(r["doc_id"] for r in got.collect()) == list(range(100, 300))
    assert verify_export(spark, dest)["ok"]


def test_verify_detects_missing_and_extra_files(spark, ds, tmp_path):
    dest = str(tmp_path / "out")
    export_slice(spark, ds, dest, id_col="doc_id", n_shards=3)
    shard_dirs = sorted(d for d in os.listdir(dest) if d.startswith("shard="))
    victim = os.path.join(dest, shard_dirs[0])
    data_files = [f for f in os.listdir(victim) if f.endswith(".parquet")]
    # duplicate a data file inside one shard: counts + fingerprint drift
    shutil.copy(
        os.path.join(victim, data_files[0]),
        os.path.join(victim, "part-extra.parquet"),
    )
    spark.catalog.refreshByPath(dest)
    rep = verify_export(spark, dest)
    assert not rep["ok"]
    assert any("rows on disk" in f or "pos" in f for f in rep["findings"])
    # remove the whole shard dir: reported as missing
    shutil.rmtree(victim)
    spark.catalog.refreshByPath(dest)
    rep = verify_export(spark, dest)
    assert not rep["ok"]
    assert any("missing on disk" in f for f in rep["findings"])


def test_mode_error_then_overwrite(spark, ds, tmp_path):
    dest = str(tmp_path / "out")
    export_slice(spark, ds, dest, id_col="doc_id", n_shards=2)
    with pytest.raises(FileExistsError):
        export_slice(spark, ds, dest, id_col="doc_id", n_shards=2)
    man = export_slice(
        spark, ds, dest, id_col="doc_id", n_shards=2, mode="overwrite"
    )
    assert man["n_rows"] == N
    assert verify_export(spark, dest)["ok"]


def test_empty_slice(spark, ds, tmp_path):
    dest = str(tmp_path / "out")
    man = export_slice(
        spark, ds, dest, id_col="doc_id",
        row_filter=("doc_id", 10_000, 20_000), n_shards=4,
    )
    assert man["n_rows"] == 0 and man["shards"] == []
    assert read_export(spark, dest).count() == 0
    assert verify_export(spark, dest)["ok"]


def test_unordered_export(spark, ds, tmp_path):
    dest = str(tmp_path / "out")
    man = export_slice(spark, ds, dest, id_col="doc_id", n_shards=4, order=False)
    got = read_export(spark, dest)
    assert "pos" not in got.columns
    assert man["n_rows"] == N and not man["ordered"]
    assert verify_export(spark, dest)["ok"]


def test_refuses_unsupported_id_type(spark, tmp_path):
    from xml2arrow_spark.errors import EncodeTypeError

    src = str(tmp_path / "src")
    dsd = str(tmp_path / "ds")
    os.makedirs(src)
    pq.write_table(
        pa.table({"v": pa.array([1.5, 2.5]), "k": pa.array([1, 2])}),
        os.path.join(src, "part-0.parquet"),
    )
    encode_parquet_dataset(spark, src, dsd)
    with pytest.raises(EncodeTypeError):
        export_slice(spark, dsd, str(tmp_path / "out"), id_col="v")


def test_string_id_and_curated_family_export(spark, tmp_path):
    """String doc_ids shard deterministically through xxhash64, and
    curated=True exports the family-joined view — a backfilled quality
    column lands in the shards with NULLs for uncovered rows."""
    from pyspark.sql import functions as F

    from xml2arrow_spark.manifest import CodecManifest
    from xml2arrow_spark.operators.checkpoint import add_columns, encode_dataset

    dsd = str(tmp_path / "ds")
    docs = spark.createDataFrame(
        [(f"d{i:03d}", i % 97, f"s{i % 3}") for i in range(N)],
        "doc_id string, n_tok int, source string",
    )
    man = CodecManifest.auto_for(docs.schema, block_rows=128)
    encode_dataset(docs, dsd, man, n_units=4)
    add_columns(
        docs.filter("n_tok % 2 = 0").select(
            "doc_id", (F.col("n_tok") * 2).alias("q_score")
        ),
        dsd,
        "quality",
    )
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    ma = export_slice(
        spark, dsd, a, id_col="doc_id",
        columns=["n_tok", "q_score"], curated=True, n_shards=5,
    )
    mb = export_slice(
        spark, dsd, b, id_col="doc_id",
        columns=["n_tok", "q_score"], curated=True, n_shards=5,
    )
    assert ma["shards"] == mb["shards"] and ma["n_rows"] == N
    got = read_export(spark, a)
    assert {"doc_id", "n_tok", "q_score", "pos", "shard"} <= set(got.columns)
    rows = {r["doc_id"]: (r["n_tok"], r["q_score"]) for r in got.collect()}
    assert len(rows) == N
    for i in range(N):
        want_q = (i % 97) * 2 if (i % 97) % 2 == 0 else None
        assert rows[f"d{i:03d}"] == (i % 97, want_q)
    assert verify_export(spark, a)["ok"]
    # physical pos order holds for the string-id window too
    for d in sorted(os.listdir(a)):
        if d.startswith("shard="):
            for fn in os.listdir(os.path.join(a, d)):
                if fn.endswith(".parquet"):
                    pos = pq.read_table(
                        os.path.join(a, d, fn), columns=["pos"]
                    ).column("pos").to_pylist()
                    assert pos == sorted(pos)


def test_no_manifest_refused(spark, ds, tmp_path):
    dest = str(tmp_path / "out")
    export_slice(spark, ds, dest, id_col="doc_id", n_shards=2)
    os.remove(os.path.join(dest, "_export_manifest.json"))
    with pytest.raises(FileNotFoundError):
        verify_export(spark, dest)
    with pytest.raises(FileNotFoundError):
        read_export(spark, dest)
