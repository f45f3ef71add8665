"""Disjunctive predicates (any_of / DNF) across the metadata-accelerated
aggregate surface.

Soundness pins, all against a brute pyarrow recompute of the raw table:

- pruning under OR requires EVERY disjunct to miss the block (telemetry
  asserts blocks outside both ranges still prune);
- an interior claim under OR requires a single disjunct to provably match
  ALL rows — a null-carrying single-conjunct disjunct (which matches only
  its non-null rows) must NOT claim, because rows it fails may match the
  other disjunct;
- overlapping disjuncts count the UNION, not the sum;
- NULL/NaN rows fail every disjunct (SQL WHERE on a DNF);
- the driver-local and distributed (local_bytes=0) paths agree.
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
    encode_parquet_dataset,
    exact_quantiles,
    group_aggs,
    group_count,
    group_sum,
    top_k,
    value_histogram,
)
from xml2arrow_spark.operators.predicates import any_of, not_between

N = 900  # 3 files x 3 blocks x 100 rows, id-clustered


def _table(lo: int, hi: int) -> pa.Table:
    ids = np.arange(lo, hi, dtype=np.int64)
    qty = [None if i % 10 == 0 else int(i % 7) for i in ids]
    val = [
        None if i % 31 == 0 else (float("nan") if i % 50 == 0 else i * 0.5)
        for i in ids
    ]
    tag = ["aaa" if i < 450 else "zzz" for i in ids]
    return pa.table(
        {
            "id": pa.array(ids),
            "qty": pa.array(qty, type=pa.int64()),
            "val": pa.array(val, type=pa.float64()),
            "tag": pa.array(tag),
        }
    )


def _rows() -> list[dict]:
    out = []
    for i in range(N):
        out.append(
            {
                "id": i,
                "qty": None if i % 10 == 0 else i % 7,
                "val": None
                if i % 31 == 0
                else (float("nan") if i % 50 == 0 else i * 0.5),
                "tag": "aaa" if i < 450 else "zzz",
            }
        )
    return out


def _match(row, disjuncts) -> bool:
    """Brute-force DNF evaluator with SQL NULL/NaN semantics."""

    def conj_ok(conj):
        conj = [conj] if isinstance(conj, tuple) else list(conj)
        for c in conj:
            if len(c) == 2:
                col, values = c
                v = row[col]
                if v is None or (isinstance(v, float) and v != v):
                    return False
                if v not in values:
                    return False
            else:
                col, lo, hi = c
                v = row[col]
                if v is None or (isinstance(v, float) and v != v):
                    return False
                if lo is not None and v < lo:
                    return False
                if hi is not None and v > hi:
                    return False
        return True

    return any(conj_ok(d) for d in disjuncts)


@pytest.fixture(scope="module", params=["nested", "wide"])
def ds(request, spark, tmp_path_factory):
    layout = request.param
    base = str(tmp_path_factory.mktemp(f"wor_{layout}"))
    src = os.path.join(base, "src")
    out = os.path.join(base, "ds")
    os.makedirs(src)
    for i in range(3):
        pq.write_table(
            _table(300 * i, 300 * (i + 1)), os.path.join(src, f"part-{i}.parquet")
        )
    manifest = CodecManifest.auto_for(
        from_arrow_schema(pq.read_schema(os.path.join(src, "part-0.parquet"))),
        block_rows=100,
    )
    encode_parquet_dataset(spark, src, out, manifest=manifest, layout=layout)
    return out


def _one(df) -> dict:
    return df.collect()[0].asDict()


def test_disjoint_ranges_prune_and_claim(spark, ds):
    # blocks: [0,100) .. [800,900). Disjuncts cover [50,149] and [700,849]:
    # blocks fully inside one disjunct claim interior, blocks outside both
    # prune, straddlers decode.
    pred = any_of(("id", 50, 149), ("id", 700, 849))
    r = _one(count_where(spark, ds, pred))
    expect = sum(_match(x, pred.disjuncts) for x in _rows())
    assert r["n_match"] == expect == 100 + 150
    assert r["n_blocks"] == 9
    assert r["n_pruned"] == 5  # [200,700): outside BOTH disjuncts
    assert r["n_interior"] == 1  # [700,800) fully inside the second
    assert r["n_boundary"] == 3  # [0,100), [100,200), [800,900) straddle


def test_overlapping_disjuncts_count_union(spark, ds):
    pred = any_of(("id", 100, 500), ("id", 400, 600))
    r = _one(count_where(spark, ds, pred))
    assert r["n_match"] == 501  # union [100,600], not 401 + 201


def test_single_disjunct_degrades_to_plain(spark, ds):
    plain = _one(count_where(spark, ds, ("id", 150, 749)))
    orred = _one(count_where(spark, ds, any_of(("id", 150, 749))))
    assert plain == orred


def test_null_single_conjunct_disjunct_never_claims(spark, ds):
    # qty has nulls; a single-conjunct disjunct on qty alone may claim
    # interior-with-null-subtraction in the PLAIN path, but under OR the
    # union with another disjunct makes that claim unsound -- the answer
    # must still be exact (boundary decode).
    pred = any_of(("qty", 0, 6), ("id", 880, None))
    r = _one(count_where(spark, ds, pred))
    expect = sum(_match(x, pred.disjuncts) for x in _rows())
    assert r["n_match"] == expect
    # every block matches some qty row AND carries a qty null -> nothing
    # prunes, nothing may claim except via the id disjunct (none: id's
    # disjunct covers only the tail block partially)
    assert r["n_interior"] == 0


def test_mixed_category_or_mask(spark, ds):
    # string disjunct OR float disjunct: NaN/NULL val rows match only via
    # the tag side; the or-mask must not resurrect them elsewhere
    pred = any_of(("tag", "aaa", "aaa"), ("val", 400.0, None))
    r = _one(count_where(spark, ds, pred))
    expect = sum(_match(x, pred.disjuncts) for x in _rows())
    assert r["n_match"] == expect


def test_or_with_agg_col(spark, ds):
    pred = any_of(("id", 0, 199), [("tag", "zzz", "zzz"), ("id", 800, None)])
    r = _one(count_where(spark, ds, pred, agg_col="qty"))
    rows = [x for x in _rows() if _match(x, pred.disjuncts)]
    qs = [x["qty"] for x in rows if x["qty"] is not None]
    assert r["n_match"] == len(rows)
    assert r["n_sum"] == sum(qs)
    assert r["n_min"] == min(qs)
    assert r["n_max"] == max(qs)


def test_or_interior_agg_claims_exact(spark, ds):
    # id is null-free, so blocks fully inside a disjunct claim interior
    # INCLUDING the metadata sum over the agg column -- must equal brute
    pred = any_of(("id", 0, 299), ("id", 600, 899))
    r = _one(count_where(spark, ds, pred, agg_col="id"))
    rows = [x for x in _rows() if _match(x, pred.disjuncts)]
    assert r["n_match"] == len(rows) == 600
    assert r["n_interior"] == 6
    assert r["n_sum"] == sum(x["id"] for x in rows)
    assert r["n_min"] == 0 and r["n_max"] == 899


def test_not_between(spark, ds):
    r = _one(count_where(spark, ds, not_between("id", 200, 699)))
    assert r["n_match"] == 400
    # and on a null-carrying column: nulls fail, complement excludes them
    r2 = _one(count_where(spark, ds, not_between("qty", 2, 6)))
    expect = sum(
        1 for x in _rows() if x["qty"] is not None and not 2 <= x["qty"] <= 6
    )
    assert r2["n_match"] == expect


def test_distributed_path_agrees(spark, ds):
    pred = any_of(("id", 50, 149), [("tag", "zzz", "zzz"), ("val", 300.0, 420.0)])
    a = _one(count_where(spark, ds, pred))
    b = _one(count_where(spark, ds, pred, local_bytes=0))
    assert a["n_match"] == b["n_match"]
    expect = sum(_match(x, pred.disjuncts) for x in _rows())
    assert a["n_match"] == expect


def _brute_groups(rows, key, disjuncts):
    out = {}
    for x in rows:
        if _match(x, disjuncts):
            out[x[key]] = out.get(x[key], 0) + 1
    return out


def test_group_count_where_or(spark, ds):
    pred = any_of(("id", 0, 149), ("id", 750, None))
    got = {
        r["tag"]: r["cnt"]
        for r in group_count(spark, ds, "tag", where=pred).collect()
    }
    assert got == _brute_groups(_rows(), "tag", pred.disjuncts)
    # distributed twin
    got2 = {
        r["tag"]: r["cnt"]
        for r in group_count(
            spark, ds, "tag", where=pred, local_bytes=0
        ).collect()
    }
    assert got2 == got


def test_group_sum_where_or(spark, ds):
    pred = any_of(("qty", 5, 6), [("tag", "aaa", "aaa"), ("id", 100, 199)])
    rows = [x for x in _rows() if _match(x, pred.disjuncts)]
    expect = {}
    for x in rows:
        c, s = expect.get(x["tag"], (0, 0))
        expect[x["tag"]] = (c + 1, s + x["id"])
    got = {
        r["tag"]: (r["cnt"], r["sum_a"])
        for r in group_sum(spark, ds, "tag", "id", where=pred).collect()
    }
    assert got == expect


def test_group_aggs_where_or(spark, ds):
    pred = any_of(("id", 0, 99), ("id", 800, None))
    rows = [x for x in _rows() if _match(x, pred.disjuncts)]
    got = {
        r["tag"]: (r["cnt"], r["sum_id"], r["min_id"], r["max_id"])
        for r in group_aggs(spark, ds, "tag", ["id"], where=pred).collect()
    }
    expect = {}
    for x in rows:
        c, s, mn, mx = expect.get(x["tag"], (0, 0, None, None))
        expect[x["tag"]] = (
            c + 1,
            s + x["id"],
            x["id"] if mn is None else min(mn, x["id"]),
            x["id"] if mx is None else max(mx, x["id"]),
        )
    assert got == expect


def test_top_k_where_or(spark, ds):
    pred = any_of(("id", 0, 99), ("id", 500, 599))
    got = [r["id"] for r in top_k(spark, ds, "id", 5, where=pred).collect()]
    assert got == [599, 598, 597, 596, 595]
    got_asc = [
        r["id"]
        for r in top_k(spark, ds, "id", 3, descending=False, where=pred).collect()
    ]
    assert got_asc == [0, 1, 2]
    # the distributed path (tau pre-pass disabled under a predicate)
    got_dist = [
        r["id"]
        for r in top_k(spark, ds, "id", 5, where=pred, local_bytes=0).collect()
    ]
    assert got_dist == got


def test_group_distinct_est_where_or(spark, ds):
    # the KMV sketch path shares the classifier/mask helpers; the OR'd
    # estimate must equal the estimate over the brute-matched subset
    from xml2arrow_spark.pipeline.sketches import group_distinct_est

    pred = any_of(("id", 0, 299), ("id", 600, None))
    got = {
        r["tag"]: r["n_distinct_est"]
        for r in group_distinct_est(spark, ds, "tag", "qty", where=pred).collect()
    }
    # qty has 7 distinct non-null values in every matched stretch; with
    # k=1024 >> 7 the KMV estimate is exact
    assert got == {"aaa": 7, "zzz": 7}


def test_quantiles_and_histogram_where_or(spark, ds):
    pred = any_of(("id", 0, 199), ("id", 700, 899))
    matched = sorted(x["id"] for x in _rows() if _match(x, pred.disjuncts))
    qs = exact_quantiles(spark, ds, "id", [500], where=pred).collect()
    n = len(matched)
    import math

    assert qs[0]["value"] == matched[math.ceil(500 * n / 1000) - 1]
    hist = {
        r["bin"]: r["cnt"]
        for r in value_histogram(spark, ds, "id", 9, where=pred).collect()
    }
    expect = {}
    for v in matched:
        b = (v - 0) * 9 // (899 - 0 + 1)
        expect[b] = expect.get(b, 0) + 1
    assert hist == expect


def test_decode_row_filter_or(spark, ds):
    # the selective-decode read path: any_of pushes an OR'd row selection
    # inside the decode kernel -- only matching rows cross Arrow
    from xml2arrow_spark.operators.dataset import decode_dataset

    pred = any_of(("id", 0, 99), [("tag", "zzz", "zzz"), ("qty", 5, 6)])
    got = sorted(
        r["id"] for r in decode_dataset(
            spark, ds, columns=["id"], row_filter=pred
        ).collect()
    )
    expect = sorted(x["id"] for x in _rows() if _match(x, pred.disjuncts))
    assert got == expect
    # filter columns outside the projection, mixed float disjunct
    pred2 = any_of(("val", 440.0, None), ("qty", [0]))
    got2 = sorted(
        r["id"] for r in decode_dataset(
            spark, ds, columns=["id"], row_filter=pred2
        ).collect()
    )
    expect2 = sorted(x["id"] for x in _rows() if _match(x, pred2.disjuncts))
    assert got2 == expect2


def test_zone_filter_or_prunes_and_keeps(spark, ds):
    # zone_filter=any_of keeps a block when ANY disjunct can intersect it:
    # with id-clustered 100-row blocks the two disjoint windows keep
    # exactly two blocks (200 rows decode), and pairing the same DNF as
    # row_filter returns the exact union
    from xml2arrow_spark.operators.dataset import decode_dataset

    zf = any_of(("id", 0, 49), ("id", 700, 749))
    sup = decode_dataset(spark, ds, columns=["id"], zone_filter=zf).collect()
    ids = sorted(r["id"] for r in sup)
    assert len(ids) == 200  # exactly the two kept blocks
    assert set(range(50)) <= set(ids) and set(range(700, 750)) <= set(ids)
    exact = sorted(
        r["id"]
        for r in decode_dataset(
            spark, ds, columns=["id"], zone_filter=zf, row_filter=zf
        ).collect()
    )
    assert exact == list(range(50)) + list(range(700, 750))


def test_zone_filter_or_mixed_category(spark, ds):
    # disjuncts on different columns: every block keeps via the tag side
    # in the first half and the id side elsewhere; row filter makes exact
    from xml2arrow_spark.operators.dataset import decode_dataset

    zf = any_of([("tag", "aaa", "aaa")], [("id", 850, 899)])
    exact = sorted(
        r["id"]
        for r in decode_dataset(
            spark, ds, columns=["id"], zone_filter=zf, row_filter=zf
        ).collect()
    )
    assert exact == list(range(450)) + list(range(850, 900))


def test_top_k_rows_where_or(spark, ds):
    from xml2arrow_spark.operators.dataset import top_k_rows

    pred = any_of(("id", 0, 99), [("tag", "zzz", "zzz"), ("qty", 5, 6)])
    got = sorted(
        r["id"]
        for r in top_k_rows(spark, ds, "id", 5, where=pred).collect()
    )
    matched = sorted(
        (x["id"] for x in _rows() if _match(x, pred.disjuncts)), reverse=True
    )
    assert got == sorted(matched[:5])


def test_any_of_validation(spark, ds):
    with pytest.raises(ValueError):
        any_of()
    with pytest.raises(ValueError):
        any_of(any_of(("id", 0, 1)))
    with pytest.raises(ValueError):
        not_between("id", None, 5)
    with pytest.raises(ValueError):
        not_between("val", 1.0, 5.0)
    with pytest.raises(ValueError):
        count_where(spark, ds, any_of(("nope", 0, 1), ("id", 0, 1)))


def test_not_in(spark, ds):
    from xml2arrow_spark.operators.predicates import not_in

    pred = not_in("id", [5, 6, 7, 300, 899])
    r = _one(count_where(spark, ds, pred))
    assert r["n_match"] == N - 5
    # adjacent points produce no empty gap; null column excluded
    pred2 = not_in("qty", [0, 1, 2])
    r2 = _one(count_where(spark, ds, pred2))
    expect = sum(
        1 for x in _rows() if x["qty"] is not None and x["qty"] not in (0, 1, 2)
    )
    assert r2["n_match"] == expect
    with pytest.raises(ValueError):
        not_in("id", [])
    with pytest.raises(ValueError):
        not_in("val", [1.5])


def test_one_sided_zone_filter_prunes(spark, ds):
    """A one-sided range zone filter must actually PRUNE (it used to be
    typed onto the null-filled float zone pair — sound but silently
    vacuous): on the id-clustered blocks, id >= 700 keeps exactly the
    last two blocks per layout, and the decoded superset shows it."""
    from xml2arrow_spark.operators.dataset import decode_dataset

    ids = sorted(
        r["id"]
        for r in decode_dataset(
            spark, ds, columns=["id"], zone_filter=("id", 700, None)
        ).collect()
    )
    assert ids == list(range(700, 900))  # 2 of 9 blocks survived
    ids2 = sorted(
        r["id"]
        for r in decode_dataset(
            spark, ds, columns=["id"], zone_filter=("id", None, 149)
        ).collect()
    )
    assert ids2 == list(range(0, 200))  # blocks [0,100) + [100,200)
    # strings too: a one-sided bound types onto the string pair now --
    # pure-aaa blocks prune, the mixed [400,500) block plus the pure-zzz
    # blocks survive (superset contract: 500 rows, not the 450 matches)
    n = decode_dataset(
        spark, ds, columns=["id"], zone_filter=("tag", "zzz", None)
    ).count()
    assert n == 500


def test_one_sided_zone_dnf(spark, ds):
    # the DNF zone shape accepts one-sided disjuncts now
    from xml2arrow_spark.operators.dataset import decode_dataset

    zf = any_of(("id", None, 99), ("id", 800, None))
    ids = sorted(
        r["id"]
        for r in decode_dataset(spark, ds, columns=["id"], zone_filter=zf).collect()
    )
    assert ids == list(range(0, 100)) + list(range(800, 900))
