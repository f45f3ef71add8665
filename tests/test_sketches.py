"""KMV distinct sketch — exactness below k, accuracy above k, determinism,
and the estimator's cross-engine integer arithmetic (pinned against a pure
Python restatement of the same rule)."""

from pyspark.sql import functions as F

from xml2arrow_spark.pipeline import sqlgen as G
from xml2arrow_spark.pipeline.sketches import kmv_distinct, kmv_token_vocab


def _py_hash(v):
    M, A = G.KMV_MOD, G.KMV_MULT
    r = ((v % M) + M) % M
    r = (r * r % M + r * A + 11) % M
    return (r * r % M + r * A) % M


def _py_kmv(values, k):
    """Driver-side restatement of the sketch rule (the oracle's arithmetic)."""
    hs = sorted({_py_hash(v) for v in values})
    if len(hs) < k:
        return len(hs)
    return (k - 1) * G.KMV_MOD // max(hs[k - 1], 1)


def test_kmv_exact_below_k(spark):
    df = spark.range(0, 40).select((F.col("id") % 17).alias("v"))
    got = kmv_distinct(df, ["v"], k=64).collect()[0]
    assert got["n_distinct_est"] == 17  # sketch never filled: exact


def test_kmv_estimate_matches_python_twin_and_is_accurate(spark):
    # 20,000 distinct values; k=256 → ~6% standard error
    df = spark.range(0, 60000).select((F.col("id") % 20000 * 7 + 3).alias("v"))
    got = kmv_distinct(df, ["v"], k=256).collect()[0]["n_distinct_est"]
    expect = _py_kmv([i % 20000 * 7 + 3 for i in range(60000)], 256)
    assert got == expect  # bit-identical to the rule, not just close
    assert abs(got - 20000) / 20000 < 0.2


def test_kmv_multi_column_single_pass(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") % 10).alias("a"),
        (F.col("id")).alias("b"),
        F.when(F.col("id") % 2 == 0, F.col("id")).alias("with_nulls"),
    )
    rows = {r["column"]: r["n_distinct_est"] for r in kmv_distinct(df, ["a", "b", "with_nulls"], k=128).collect()}
    assert rows["a"] == 10
    assert abs(rows["b"] - 5000) / 5000 < 0.25
    # nulls excluded: 2500 distinct non-null values
    assert abs(rows["with_nulls"] - 2500) / 2500 < 0.25


def test_kmv_token_vocab_per_source(spark):
    from xml2arrow_spark.sources import tokens_dataframe

    tok = tokens_dataframe(spark, 400, variant="low_card", n_partitions=2)
    got = {r["source"]: r["n_distinct_est"] for r in kmv_token_vocab(tok, k=512).collect()}
    truth = {
        r["source"]: r["d"]
        for r in tok.select("source", F.explode("tokens").alias("t"))
        .groupBy("source")
        .agg(F.countDistinct("t").alias("d"))
        .collect()
    }
    assert set(got) == set(truth)
    for s, est in got.items():
        if truth[s] < 512:
            assert est == truth[s]
        else:
            assert abs(est - truth[s]) / truth[s] < 0.2
