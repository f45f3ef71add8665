"""Pytest-side mirror of the driver's correctness gate: a representative
subset of ``__spark_entry__.queries()`` compared against ``oracle_sql()``
via DuckDB at sf0.001. The full 26-query sweep lives in
``tools/check_parity.py`` (run it at sf0.01 before shipping); this keeps the
gate inside `python -m pytest -x -q` per BASELINE.json's input_hint.
"""

from __future__ import annotations

import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# cheap-but-diverse subset: engine core, dedup, text, similarity, events
SUBSET = [
    "tokenize",
    "encode_roundtrip",
    "encode_typed_roundtrip",
    "dedup_exact",
    "simhash_full",
    "text_analysis",
    "cosine_topk_all",
    "embedding_near_dup",
    "affine_transform",
    "event_type_stats",
    "sessionize",
]


def _canon_val(v):
    import numpy as np

    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_canon_val(x) for x in v)
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, (np.floating, float)):
        return repr(float(v))
    return v


def _canon(df):
    cols = sorted(df.columns)
    rows = sorted(
        tuple(_canon_val(v) for v in t)
        for t in df[cols].itertuples(index=False, name=None)
    )
    return len(rows), rows


@pytest.fixture(scope="module")
def duck(sf_dir):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    import __spark_entry__ as entry

    q = entry.queries()[name]
    oracle = entry.oracle_sql()[name]
    got = _canon(q(spark, sf_dir).toPandas())
    want = _canon(duck.execute(oracle).df())
    assert got[0] == want[0], f"{name}: row count {got[0]} != {want[0]}"
    assert got[1] == want[1], f"{name}: values differ"


def test_queries_and_oracles_consistent():
    """Every query has an oracle (round 2: zero rows-only queries left) and
    every oracle has a query."""
    import __spark_entry__ as entry

    qs = set(entry.queries())
    os_ = set(entry.oracle_sql())
    assert os_ == qs, (os_ - qs, qs - os_)
