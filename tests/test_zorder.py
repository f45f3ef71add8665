"""Z-order clustering on the fused dataset encode: physical layout only
(decoded values identical), but zone maps prune on EVERY clustered column —
pinned against lexicographic presort, which prunes only the leading one.
"""

from __future__ import annotations

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
)
from xml2arrow_spark.operators.zorder import presort_table, zorder_indices

N = 60000


def _table() -> pa.Table:
    rng = np.random.default_rng(11)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(N, dtype=np.int64)),
            "x": pa.array(rng.integers(0, 100000, size=N).astype(np.int64)),
            "y": pa.array(rng.integers(0, 100000, size=N).astype(np.int64)),
        }
    )


@pytest.fixture(scope="module")
def datasets(spark, tmp_path_factory):
    """The same source encoded three ways: unclustered, lex presort,
    z-order."""
    base = str(tmp_path_factory.mktemp("zorder"))
    src = os.path.join(base, "src")
    os.makedirs(src)
    tbl = _table()
    for i in range(4):
        pq.write_table(
            tbl.slice(15000 * i, 15000), os.path.join(src, f"part-{i}.parquet")
        )
    manifest = CodecManifest.auto_for(
        from_arrow_schema(tbl.schema), block_rows=1000
    )
    out = {}
    for name, ps, cl in [
        ("none", None, "lex"),
        ("lex", ["x", "y"], "lex"),
        ("zorder", ["x", "y"], "zorder"),
    ]:
        path = os.path.join(base, f"ds_{name}")
        encode_parquet_dataset(
            spark, src, path, manifest=manifest, layout="wide",
            presort=ps, cluster=cl,
        )
        out[name] = path
    return tbl, out


# ---- kernel ------------------------------------------------------------------


def test_zorder_indices_deterministic_permutation():
    tbl = _table().slice(0, 5000)
    a = zorder_indices(tbl, ["x", "y"])
    b = zorder_indices(tbl, ["x", "y"])
    assert np.array_equal(a, b)
    assert sorted(a.tolist()) == list(range(5000))  # a true permutation


def test_zorder_single_column_is_rank_sort():
    tbl = _table().slice(0, 3000)
    idx = zorder_indices(tbl, ["x"])
    xs = tbl.column("x").to_numpy()[idx]
    assert np.all(np.diff(xs) >= 0)


def test_zorder_nulls_rank_lowest_in_their_dimension():
    from xml2arrow_spark.operators.zorder import _bucket_ranks

    vals = [None] * 50 + list(range(950))
    rng = np.random.default_rng(3)
    perm = rng.permutation(1000)
    arr = pa.array([vals[i] for i in perm], type=pa.int64())
    codes = _bucket_ranks(arr, 1000)
    null_mask = np.array([v is None for v in arr.to_pylist()])
    # nulls take the lowest rank buckets of their OWN dimension (they
    # carry no zone bound, so clustering them together keeps null-free
    # blocks provable); the Morton interleave then spreads them only as
    # far as the OTHER dimensions demand
    assert codes[null_mask].max() < codes[~null_mask].min()


def test_zorder_validation_and_empty():
    tbl = _table().slice(0, 10)
    with pytest.raises(ValueError, match="1-4 columns"):
        zorder_indices(tbl, ["x", "y", "doc_id", "x", "y"])
    assert zorder_indices(_table().slice(0, 0), ["x"]).size == 0
    with pytest.raises(ValueError, match="unknown cluster"):
        presort_table(tbl, ["x"], "hilbert")


def test_presort_table_lex_matches_sort_by():
    tbl = _table().slice(0, 2000)
    got = presort_table(tbl, ["x", "y"], "lex")
    want = tbl.sort_by(
        [("x", "ascending"), ("y", "ascending")], null_placement="at_start"
    )
    assert got.equals(want)


# ---- dataset-level -----------------------------------------------------------


def test_clustering_never_changes_decoded_values(spark, datasets):
    from pyspark.sql import functions as F

    tbl, out = datasets
    src_df = spark.createDataFrame(tbl.to_pandas())
    for path in out.values():
        dec = decode_dataset(spark, path)
        j = src_df.alias("a").join(dec.alias("b"), "doc_id", "full_outer")
        assert j.filter(F.expr(
            "a.x IS DISTINCT FROM b.x OR a.y IS DISTINCT FROM b.y"
        )).count() == 0


def test_zorder_prunes_on_every_clustered_column(spark, datasets):
    """The point of the layout: lex prunes only the leading column; z-order
    prunes BOTH, and every clustering returns identical answers."""
    _tbl, out = datasets
    stats = {
        name: {
            ax: count_where(spark, path, (ax, 10000, 20000)).collect()[0].asDict()
            for ax in ("x", "y")
        }
        for name, path in out.items()
    }
    # identical exact counts regardless of physical layout
    assert len({s["x"]["n_match"] for s in stats.values()}) == 1
    assert len({s["y"]["n_match"] for s in stats.values()}) == 1
    assert stats["lex"]["x"]["n_pruned"] > 0
    assert stats["lex"]["y"]["n_pruned"] == 0  # lex is blind on column 2
    assert stats["zorder"]["x"]["n_pruned"] > 0
    assert stats["zorder"]["y"]["n_pruned"] > 0  # z-order is not
    # and the conjunction prunes at least as hard as lex
    conj = [("x", 10000, 20000), ("y", 10000, 20000)]
    zc = count_where(spark, out["zorder"], conj).collect()[0].asDict()
    lc = count_where(spark, out["lex"], conj).collect()[0].asDict()
    assert zc["n_match"] == lc["n_match"]
    assert zc["n_pruned"] >= lc["n_pruned"]


def test_resume_with_different_clustering_refuses(spark, datasets, tmp_path):
    from xml2arrow_spark.errors import ManifestError

    tbl, out = datasets
    with pytest.raises(ManifestError, match="clustering"):
        encode_parquet_dataset(
            spark, os.path.join(os.path.dirname(out["zorder"]), "src"),
            out["zorder"], layout="wide", presort=["x", "y"], cluster="lex",
        )
    with pytest.raises(ValueError, match="unknown cluster"):
        encode_parquet_dataset(
            spark, str(tmp_path), str(tmp_path / "o"), cluster="hilbert"
        )


def test_aggregates_exact_on_zordered_dataset(spark, datasets):
    """The metadata-accelerated aggregates ride the z-ordered zone maps
    unchanged: same answers, more pruning."""
    from xml2arrow_spark.operators.dataset import top_k

    _tbl, out = datasets
    vals = {
        name: [r["x"] for r in top_k(spark, path, "x", 25).collect()]
        for name, path in out.items()
    }
    assert vals["none"] == vals["lex"] == vals["zorder"]
