"""Seeded adversarial sweep for the DNF predicate classifier: random
disjunctions of random conjuncts (two-sided / one-sided ranges,
IN-lists, int / float / string categories, NULL- and NaN-carrying
columns) evaluated by count_where and group_count(where=) against a
brute-force recompute of the raw rows. Any unsound prune, bad interior
claim, or mis-OR'd boundary mask shifts a count somewhere in the sweep.

The generator is SEEDED (no Date/random at import) and biases toward
the hazardous shapes: disjunct bounds that straddle block edges of the
id-clustered column, single-conjunct null-column disjuncts (whose plain
interior claim is unsound under OR), and overlapping disjuncts (union
vs sum)."""

from __future__ import annotations

import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.pandas.types import from_arrow_schema

from xml2arrow_spark.manifest import CodecManifest
from xml2arrow_spark.operators.dataset import (
    count_where,
    encode_parquet_dataset,
    group_count,
)
from xml2arrow_spark.operators.predicates import any_of

N = 1200  # 3 files x 4 blocks x 100 rows, id-clustered
TAGS = ["alpha", "beta", "gamma", "zz"]


def _rows() -> list[dict]:
    rng = random.Random(421)
    out = []
    for i in range(N):
        out.append({
            "id": i,
            "qty": None if rng.random() < 0.08 else rng.randrange(0, 12),
            "val": (
                None if rng.random() < 0.05
                else (float("nan") if rng.random() < 0.04 else rng.uniform(0, 100))
            ),
            "tag": rng.choice(TAGS),
        })
    return out


_ROWS = _rows()


def _table(lo: int, hi: int) -> pa.Table:
    rows = _ROWS[lo:hi]
    return pa.table({
        "id": pa.array([r["id"] for r in rows], type=pa.int64()),
        "qty": pa.array([r["qty"] for r in rows], type=pa.int64()),
        "val": pa.array([r["val"] for r in rows], type=pa.float64()),
        "tag": pa.array([r["tag"] for r in rows]),
    })


@pytest.fixture(scope="module", params=["nested", "wide"])
def ds(request, spark, tmp_path_factory):
    layout = request.param
    base = str(tmp_path_factory.mktemp(f"worr_{layout}"))
    src = os.path.join(base, "src")
    out = os.path.join(base, "ds")
    os.makedirs(src)
    for i in range(3):
        pq.write_table(_table(400 * i, 400 * (i + 1)),
                       os.path.join(src, f"part-{i}.parquet"))
    manifest = CodecManifest.auto_for(
        from_arrow_schema(pq.read_schema(os.path.join(src, "part-0.parquet"))),
        block_rows=100,
    )
    encode_parquet_dataset(spark, src, out, manifest=manifest, layout=layout)
    return out


def _rand_conjunct(rng):
    col = rng.choice(["id", "qty", "val", "tag"])
    if col == "id":
        # bias toward block-edge-straddling bounds (blocks are 100 rows)
        a = rng.choice([0, 49, 99, 100, 101, 150, 399, 400, 401, 799, 1100])
        b = a + rng.choice([0, 1, 50, 99, 100, 250])
        shape = rng.randrange(4)
        if shape == 0:
            return (col, a, b)
        if shape == 1:
            return (col, a, None)
        if shape == 2:
            return (col, None, b)
        return (col, sorted(rng.sample(range(0, N), rng.randrange(1, 5))))
    if col == "qty":
        if rng.random() < 0.4:
            return (col, sorted(set(rng.sample(range(0, 12), rng.randrange(1, 4)))))
        a = rng.randrange(0, 12)
        return (col, a, min(11, a + rng.randrange(0, 6)))
    if col == "val":
        a = round(rng.uniform(0, 90), 2)
        shape = rng.randrange(3)
        if shape == 0:
            return (col, a, round(a + rng.uniform(0, 40), 2))
        if shape == 1:
            return (col, a, None)
        return (col, None, a)
    lo = rng.choice(TAGS)
    hi = rng.choice(TAGS)
    if lo > hi:
        lo, hi = hi, lo
    if rng.random() < 0.3:
        return (col, rng.sample(TAGS, rng.randrange(1, 3)))
    return (col, lo, hi)


def _match_conj(row, conj) -> bool:
    for c in conj:
        if len(c) == 2:
            col, values = c
            v = row[col]
            if v is None or (isinstance(v, float) and v != v) or v not in values:
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


def test_randomized_dnf_counts(spark, ds):
    rng = random.Random(7)
    for case in range(30):
        disjuncts = [
            [_rand_conjunct(rng) for _ in range(rng.randrange(1, 3))]
            for _ in range(rng.randrange(2, 4))
        ]
        pred = any_of(*disjuncts)
        expect = sum(
            1 for r in _ROWS if any(_match_conj(r, d) for d in disjuncts)
        )
        got = count_where(spark, ds, pred).collect()[0]
        assert got["n_match"] == expect, (case, disjuncts)


def test_randomized_dnf_group_counts(spark, ds):
    rng = random.Random(11)
    for case in range(10):
        disjuncts = [
            [_rand_conjunct(rng) for _ in range(rng.randrange(1, 3))]
            for _ in range(rng.randrange(2, 4))
        ]
        pred = any_of(*disjuncts)
        expect: dict = {}
        for r in _ROWS:
            if any(_match_conj(r, d) for d in disjuncts):
                expect[r["tag"]] = expect.get(r["tag"], 0) + 1
        got = {
            r["tag"]: r["cnt"]
            for r in group_count(spark, ds, "tag", where=pred).collect()
        }
        assert got == expect, (case, disjuncts)


def test_randomized_dnf_row_filter_decode(spark, ds):
    """The selective decode under random DNFs: the kernel-side OR mask
    must return exactly the brute-matched id set."""
    rng = random.Random(23)
    from xml2arrow_spark.operators.dataset import decode_dataset

    for case in range(8):
        disjuncts = [
            [_rand_conjunct(rng) for _ in range(rng.randrange(1, 3))]
            for _ in range(rng.randrange(2, 4))
        ]
        pred = any_of(*disjuncts)
        expect = sorted(
            r["id"] for r in _ROWS if any(_match_conj(r, d) for d in disjuncts)
        )
        got = sorted(
            r["id"]
            for r in decode_dataset(
                spark, ds, columns=["id"], row_filter=pred
            ).collect()
        )
        assert got == expect, (case, disjuncts)


def test_randomized_dnf_zone_filter_superset(spark, ds):
    """zone_filter=any_of alone returns a SUPERSET of the matching rows
    (conservative pruning); paired with the same DNF as row_filter it is
    exact. Random both-bounds range disjuncts only (the zone shape)."""
    rng = random.Random(31)
    from xml2arrow_spark.operators.dataset import decode_dataset

    def _zone_conjunct():
        col = rng.choice(["id", "qty"])
        if col == "id":
            a = rng.choice([0, 99, 100, 150, 400, 799, 1100])
            return (col, a, a + rng.choice([0, 1, 99, 100, 250]))
        a = rng.randrange(0, 12)
        return (col, a, min(11, a + rng.randrange(0, 6)))

    for case in range(6):
        disjuncts = [
            [_zone_conjunct() for _ in range(rng.randrange(1, 3))]
            for _ in range(rng.randrange(2, 4))
        ]
        pred = any_of(*disjuncts)
        expect = sorted(
            r["id"] for r in _ROWS if any(_match_conj(r, d) for d in disjuncts)
        )
        sup = {
            r["id"]
            for r in decode_dataset(
                spark, ds, columns=["id"], zone_filter=pred
            ).collect()
        }
        assert set(expect) <= sup, case  # superset contract
        exact = sorted(
            r["id"]
            for r in decode_dataset(
                spark, ds, columns=["id"], zone_filter=pred, row_filter=pred
            ).collect()
        )
        assert exact == expect, (case, disjuncts)


def test_not_rewrites_cover_exact_complements():
    """Property: the not_between / not_in DNF rewrites partition the
    integer line exactly — every point is in the original predicate XOR
    in some rewrite disjunct (pure evaluation, no Spark)."""
    from hypothesis import given, settings, strategies as st

    from xml2arrow_spark.operators.predicates import not_between, not_in

    def in_range(v, lo, hi):
        return (lo is None or v >= lo) and (hi is None or v <= hi)

    @settings(max_examples=200, deadline=None)
    @given(
        st.integers(-50, 50), st.integers(0, 30), st.integers(-80, 80)
    )
    def check_between(a, w, v):
        d = not_between("c", a, a + w).disjuncts
        inside = a <= v <= a + w
        matched = any(in_range(v, lo, hi) for _c, lo, hi in d)
        assert matched != inside

    @settings(max_examples=200, deadline=None)
    @given(
        st.sets(st.integers(-40, 40), min_size=1, max_size=8),
        st.integers(-60, 60),
    )
    def check_in(values, v):
        d = not_in("c", values).disjuncts
        matched = any(in_range(v, lo, hi) for _c, lo, hi in d)
        assert matched != (v in values)
        # and no empty/inverted gap disjunct exists
        for _c, lo, hi in d:
            assert lo is None or hi is None or lo <= hi

    check_between()
    check_in()
