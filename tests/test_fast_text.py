"""The vectorized minhash path must equal the SQL-expression path
element-exact — the SQL version IS the specification (and the DuckDB
oracle); the numpy version is the throughput path.
"""

from __future__ import annotations

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from xml2arrow_spark.pipeline import dedup, sqlgen as G
from xml2arrow_spark.pipeline.fast_text import minhash_batch, word_tokens_batch


EDGE_TEXTS = [
    "",
    "a",
    "a b",
    "a b c",
    "a b c d e f",
    "héllo wörld ünïcode ё日本",
    "x " * 50,
    "  double  spaces  here",
    "same same same same",
    "\U0001f389 emoji four-byte \U0001f680 chars here",
]


def _sql_reference(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {
        r["doc_id"]: r
        for r in dedup.minhash_signatures(df).collect()
    }


def test_word_tokens_match_sql(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(EDGE_TEXTS)], "doc_id long, text string"
    )
    sql_rows = df.select(
        "doc_id", F.expr(G.word_tokens_arr("text", "spark")).alias("toks")
    ).collect()
    texts = pa.array(EDGE_TEXTS, type=pa.large_string())
    import pyarrow.compute as pc

    words = pc.split_pattern(texts, " ").cast(pa.list_(pa.string()))
    toks, offsets = word_tokens_batch(words)
    for r in sql_rows:
        i = r["doc_id"]
        got = toks[offsets[i] : offsets[i + 1]].tolist()
        assert got == r["toks"], (i, EDGE_TEXTS[i], got, r["toks"])


def test_minhash_fast_matches_sql_on_edges(spark):
    ref = _sql_reference(spark, EDGE_TEXTS)
    out = minhash_batch(pa.array(EDGE_TEXTS, type=pa.string()))
    sig = out["sig"].to_pylist()
    for i in range(len(EDGE_TEXTS)):
        assert sig[i] == ref[i]["sig"], (i, EDGE_TEXTS[i])
        for b in range(G.MINHASH_BANDS):
            assert out[f"band{b}"][i].as_py() == ref[i][f"band{b}"], (i, b)


def test_minhash_fast_matches_sql_on_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    slow = {r["doc_id"]: r for r in dedup.minhash_signatures(docs).collect()}
    fast = {r["doc_id"]: r for r in dedup.minhash_signatures_fast(docs).collect()}
    assert set(slow) == set(fast)
    for k in slow:
        assert slow[k]["sig"] == fast[k]["sig"], k
        for b in range(G.MINHASH_BANDS):
            assert slow[k][f"band{b}"] == fast[k][f"band{b}"], (k, b)


def test_minhash_fast_null_text(spark):
    df = spark.createDataFrame(
        [(0, None), (1, "a b c d")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in dedup.minhash_signatures_fast(df).collect()}
    assert rows[0]["sig"] == [None] * G.MINHASH_K
    assert rows[0]["band0"] is None
    assert rows[1]["band0"] is not None


def test_simhash_fast_matches_sql(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    slow = {r["doc_id"]: r["simhash"] for r in dedup.with_simhash(docs).select("doc_id", "simhash").collect()}
    fast = {r["doc_id"]: r["simhash"] for r in dedup.simhash_ids_fast(docs).collect()}
    assert slow == fast


def test_simhash_fast_matches_sql_on_edges(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(EDGE_TEXTS)] + [(99, None)],
        "doc_id long, text string",
    )
    slow = {r["doc_id"]: r["simhash"] for r in dedup.with_simhash(df).select("doc_id", "simhash").collect()}
    fast = {r["doc_id"]: r["simhash"] for r in dedup.simhash_ids_fast(df).collect()}
    assert slow == fast
