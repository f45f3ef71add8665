"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Every oracle here is rendered from the same dialect-neutral SQL templates
the Spark operators are built from (xml2arrow_spark/pipeline/sqlgen.py), so
Spark and DuckDB agree bit-for-bit — including float results, which are
sequential IEEE folds in both engines.

Queries without an oracle entry (encode_metadata, codec_selection,
multimodal_features) are engine-internal artifacts (codec choices, block
lineage, stubbed media features) that ANSI SQL cannot express; the driver
records the weaker rows-only check for them.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from xml2arrow_spark.manifest import CodecManifest
from xml2arrow_spark.operators.encode import blocks_metadata, decode_table, encode_table
from xml2arrow_spark.operators.partitioning import salt_skewed, with_work_bucket
from xml2arrow_spark.pipeline import (
    dedup,
    events as events_ops,
    multimodal,
    similarity,
    textstats,
)
from xml2arrow_spark.pipeline.oracles import all_oracles
from xml2arrow_spark.plans.selector import resolve_manifest
from xml2arrow_spark.sources.tokens import tokenize_documents

TOKENS_DDL = "doc_id string, tokens array<int>, n_tok int, source string"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


# -- engine core --------------------------------------------------------------


def q_tokenize(spark, sf_dir):
    return tokenize_documents(_docs(spark, sf_dir))


def q_encode_roundtrip(spark, sf_dir):
    """Flagship: tokenize → codec auto-selection → encode → decode; the
    result must be bit-identical to the tokenized source (oracle recomputes
    it independently in DuckDB)."""
    tok = tokenize_documents(_docs(spark, sf_dir))
    manifest = resolve_manifest(tok, CodecManifest.auto_for(tok.schema, block_rows=4096))
    blocks = encode_table(tok, manifest)
    return decode_table(blocks, TOKENS_DDL)


def q_encode_metadata(spark, sf_dir):
    """Per-(column, codec) block lineage — rows-only (codec selection is
    engine-internal, not SQL-expressible)."""
    tok = tokenize_documents(_docs(spark, sf_dir))
    manifest = resolve_manifest(tok, CodecManifest.auto_for(tok.schema, block_rows=4096))
    meta = blocks_metadata(encode_table(tok, manifest))
    col = F.explode("col_codecs").alias("c")
    return (
        meta.select(col)
        .select("c.name", "c.codec", "c.in_bytes", "c.out_bytes")
        .groupBy("name", "codec")
        .agg(
            F.count("*").alias("n_blocks"),
            F.sum("in_bytes").alias("in_bytes"),
            F.sum("out_bytes").alias("out_bytes"),
        )
    )


def q_codec_selection(spark, sf_dir):
    """Resolved manifest as a table — rows-only."""
    tok = tokenize_documents(_docs(spark, sf_dir))
    manifest = resolve_manifest(tok, CodecManifest.auto_for(tok.schema))
    rows = [(c, p.codec) for c, p in sorted(manifest.columns.items())]
    return spark.createDataFrame(rows, "column string, codec string")


def q_token_stats(spark, sf_dir):
    tok = tokenize_documents(_docs(spark, sf_dir))
    return tok.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.min(F.array_min("tokens")).alias("min_token"),
        F.max(F.array_max("tokens")).alias("max_token"),
    )


def q_work_buckets(spark, sf_dir):
    tok = tokenize_documents(_docs(spark, sf_dir))
    return with_work_bucket(tok).groupBy("work_bucket").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("total_tokens")
    )


def q_salted_source_stats(spark, sf_dir):
    """Per-source stats through an EXPLICIT two-stage salted aggregation
    (north rule: salt skewed source partitions). Stage 1 partial-aggregates
    on (source, salt) — the skewed head key fans out over 8 salts — stage 2
    merges to the final per-source row. The oracle is the plain GROUP BY:
    salting must never change results."""
    tok = tokenize_documents(_docs(spark, sf_dir))
    salted = salt_skewed(tok, "source", skewed_values=["src0"], n_salts=8)
    partial = salted.groupBy("source", "salted_key").agg(
        F.count("*").alias("c"), F.sum("n_tok").alias("t")
    )
    return partial.groupBy("source").agg(
        F.sum("c").alias("n_docs"), F.sum("t").alias("total_tokens")
    )


# -- dedup --------------------------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    return dedup.exact_dedup(_docs(spark, sf_dir))


def q_minhash_signatures(spark, sf_dir):
    return dedup.minhash_signatures(_docs(spark, sf_dir))


def q_lsh_near_dup_pairs(spark, sf_dir):
    return dedup.lsh_near_dup_pairs(_docs(spark, sf_dir))


def q_simhash(spark, sf_dir):
    return dedup.simhash_ids_fast(_docs(spark, sf_dir))


def q_simhash_groups(spark, sf_dir):
    return dedup.simhash_groups(_docs(spark, sf_dir))


def q_neighbor_jaccard(spark, sf_dir):
    return dedup.neighbor_jaccard(_docs(spark, sf_dir))


# -- text analysis -------------------------------------------------------------


def q_lang_id(spark, sf_dir):
    return textstats.lang_id(_docs(spark, sf_dir))


def q_text_quality(spark, sf_dir):
    return textstats.text_quality(_docs(spark, sf_dir))


def q_token_counts(spark, sf_dir):
    return textstats.token_counts(_docs(spark, sf_dir))


def q_doc_fingerprint(spark, sf_dir):
    return textstats.doc_fingerprint(_docs(spark, sf_dir))


# -- similarity ----------------------------------------------------------------


def q_cosine_topk(spark, sf_dir):
    return similarity.cosine_topk(_emb(spark, sf_dir), query_id=0, k=10)


def q_lsh_ann_topk(spark, sf_dir):
    return similarity.lsh_ann_topk(_emb(spark, sf_dir), query_id=0, k=5)


def q_embedding_near_dup(spark, sf_dir):
    return similarity.embedding_near_dup(_emb(spark, sf_dir), threshold=0.3)


# -- un-nesting / scalar transforms (reference parity: U1-U5, C2) ---------------


def q_unnest_orders(spark, sf_dir):
    """collect_list → posexplode round trip: the Spark mapping of the
    reference's parent-index/<level> linkage (reference
    src/xml_parser.rs:472-489; SURVEY §2.4)."""
    li = _lineitem(spark, sf_dir)
    nested = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(F.struct("l_linenumber", "l_partkey", "l_quantity"))
        ).alias("items")
    )
    return nested.select(
        "l_orderkey", F.posexplode("items").alias("item_idx", "item")
    ).select(
        "l_orderkey",
        F.col("item_idx").cast("int").alias("item_idx"),
        F.col("item.l_linenumber").alias("l_linenumber"),
        F.col("item.l_partkey").alias("l_partkey"),
        F.col("item.l_quantity").alias("l_quantity"),
    )


def q_sessionize(spark, sf_dir):
    """30-minute-gap sessionization over the events stream (window
    functions; exact integer arithmetic for the oracle)."""
    return events_ops.sessionize(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    )


def q_event_type_stats(spark, sf_dir):
    return events_ops.event_type_stats(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    )


def q_encode_typed_roundtrip(spark, sf_dir):
    """Mixed int/double/string projection of lineitem through the encode
    engine and back — floats are first-class (plain_float, bit-identical)."""
    cols = ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
            "l_returnflag", "l_linestatus"]
    df = _lineitem(spark, sf_dir).select(*cols)
    manifest = CodecManifest.auto_for(df.schema, block_rows=8192)
    ddl = ("l_orderkey bigint, l_linenumber int, l_quantity double, "
           "l_extendedprice double, l_returnflag string, l_linestatus string")
    return decode_table(encode_table(df, manifest), ddl)


def q_affine_transform(spark, sf_dir):
    """The reference's float affine transform value*scale + offset
    (src/xml_parser.rs:252-291) as a Catalyst expression."""
    return _lineitem(spark, sf_dir).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * F.lit(0.01) + F.lit(100.0)).alias("adjusted"),
    )


# -- multimodal ----------------------------------------------------------------


def q_multimodal_meta(spark, sf_dir):
    return multimodal.media_metadata(
        multimodal.attach_binary_payload(_docs(spark, sf_dir))
    )


def q_multimodal_features(spark, sf_dir):
    """Arrow-batched feature extraction with the deterministic fake decoder
    (real decoders stubbed; plumbing real) — rows-only."""
    return multimodal.extract_features(
        multimodal.attach_binary_payload(_docs(spark, sf_dir)),
        decoder=multimodal.fake_decoder,
    )


# -- driver contract ------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_encode_roundtrip(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "tokenize": q_tokenize,
        "encode_roundtrip": q_encode_roundtrip,
        "encode_metadata": q_encode_metadata,
        "codec_selection": q_codec_selection,
        "token_stats": q_token_stats,
        "work_buckets": q_work_buckets,
        "salted_source_stats": q_salted_source_stats,
        "dedup_exact": q_dedup_exact,
        "minhash_signatures": q_minhash_signatures,
        "lsh_near_dup_pairs": q_lsh_near_dup_pairs,
        "simhash": q_simhash,
        "simhash_groups": q_simhash_groups,
        "neighbor_jaccard": q_neighbor_jaccard,
        "lang_id": q_lang_id,
        "text_quality": q_text_quality,
        "token_counts": q_token_counts,
        "doc_fingerprint": q_doc_fingerprint,
        "cosine_topk": q_cosine_topk,
        "lsh_ann_topk": q_lsh_ann_topk,
        "embedding_near_dup": q_embedding_near_dup,
        "unnest_orders": q_unnest_orders,
        "affine_transform": q_affine_transform,
        "sessionize": q_sessionize,
        "event_type_stats": q_event_type_stats,
        "encode_typed_roundtrip": q_encode_typed_roundtrip,
        "multimodal_meta": q_multimodal_meta,
        "multimodal_features": q_multimodal_features,
    }


def oracle_sql() -> dict[str, str]:
    return all_oracles()
