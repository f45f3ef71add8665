"""Wide blocks layout: per-column top-level (codec, meta, data) triples so a
persisted blocks table supports PARQUET column pruning at decode — reading
one of k columns reads ~1/k of the payload bytes (the decode-side analog of
the scan-side unknown-subtree skip, /root/reference/src/path_registry.rs:400-408)."""

import pytest
from pyspark.sql import functions as F

from xml2arrow_spark.manifest import CodecManifest
from xml2arrow_spark.operators.encode import decode_table, encode_table
from xml2arrow_spark.sources.tokens import tokens_dataframe

DDL = "doc_id string, tokens array<int>, n_tok int, source string"


@pytest.fixture(scope="module")
def tok(spark):
    df = tokens_dataframe(spark, 2000, variant="skewed_zipf", n_partitions=4).cache()
    yield df
    df.unpersist()


def test_wide_roundtrip_bit_identical(spark, tok):
    man = CodecManifest.auto_for(tok.schema, block_rows=512)
    blocks = encode_table(tok, man, layout="wide")
    dec = decode_table(blocks, DDL)
    j = tok.alias("a").join(dec.alias("b"), F.col("a.doc_id") == F.col("b.doc_id"), "full_outer")
    bad = j.filter(
        " OR ".join(f"a.{c} IS DISTINCT FROM b.{c}" for c in tok.columns)
    ).count()
    assert bad == 0


def test_wide_layout_matches_nested_values(spark, tok):
    man = CodecManifest.auto_for(tok.schema, block_rows=512)
    a = decode_table(encode_table(tok, man), DDL)
    b = decode_table(encode_table(tok, man, layout="wide"), DDL)
    assert sorted(map(str, a.collect())) == sorted(map(str, b.collect()))


def test_wide_subset_decode_prunes_parquet_scan(spark, tok, tmp_path):
    """Decoding (doc_id, n_tok) from a persisted wide blocks table must NOT
    read the tokens payload: ReadSchema is pinned to the requested columns."""
    man = CodecManifest.auto_for(tok.schema, block_rows=512)
    path = str(tmp_path / "wide_blocks")
    encode_table(tok, man, layout="wide").write.parquet(path)
    blocks = spark.read.parquet(path)
    sub = decode_table(blocks, "doc_id string, n_tok int")
    got = {r["doc_id"]: r["n_tok"] for r in sub.collect()}
    want = {r["doc_id"]: r["n_tok"] for r in tok.select("doc_id", "n_tok").collect()}
    assert got == want
    plan = sub._jdf.queryExecution().executedPlan().toString()
    scan_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "c_doc_id__data" in scan_line
    assert "c_tokens__data" not in scan_line  # the big payload is pruned
    assert "c_source__data" not in scan_line


def test_nested_subset_decode_skips_unneeded_kernels(spark, tok):
    man = CodecManifest.auto_for(tok.schema, block_rows=512)
    sub = decode_table(encode_table(tok, man), "n_tok int, source string")
    assert sub.columns == ["n_tok", "source"]
    assert sub.count() == 2000


def test_unknown_layout_rejected(spark, tok):
    with pytest.raises(ValueError, match="unknown blocks layout"):
        encode_table(tok, CodecManifest.auto_for(tok.schema), layout="diagonal")


def test_wide_missing_column_rejected(spark, tok):
    man = CodecManifest.auto_for(tok.schema, block_rows=512)
    blocks = encode_table(tok, man, layout="wide")
    with pytest.raises(ValueError, match="lacks columns"):
        decode_table(blocks, "doc_id string, nope int")
