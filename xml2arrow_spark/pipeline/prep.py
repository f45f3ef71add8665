"""End-to-end corpus preparation: the composed training-data pipeline.

quality gate → exact dedup → transitive near-dup resolution → tokenize →
encode → (bit-identical) decode. This is the workflow a real pre-training
data pipeline runs; each stage is one of the engine's oracle-gated
operators, and the composition itself is gated (the DuckDB oracle rebuilds
the same CTE chain from the stage oracles).

Scale shape: the quality and dedup keeps are LEFT-SEMI / LEFT-ANTI joins on
doc ids (never the payload twice); near-dup pair generation runs only on
the exact-dedup survivors (strictly smaller input); the encode stage is the
map-only blocks path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from xml2arrow_spark.manifest import CodecManifest
from xml2arrow_spark.operators.encode import decode_table, encode_table
from xml2arrow_spark.pipeline import dedup, textstats
from xml2arrow_spark.plans.selector import resolve_manifest
from xml2arrow_spark.sources.tokens import tokenize_documents

__all__ = ["corpus_prep", "surviving_documents"]

TOKENS_DDL = "doc_id string, tokens array<int>, n_tok int, source string"


def surviving_documents(docs: DataFrame, sig_path: str | None = None) -> DataFrame:
    """quality_filter → exact dedup (keep min id per text) → near-dup
    resolution (keep canonical ids). Returns the surviving document rows.

    ``sig_path`` routes the near-dup stage through the two-phase
    signature-table shape (no executor-storage cache) — pass it on any run
    too large to cache the signature relation; see
    :func:`xml2arrow_spark.pipeline.dedup.lsh_near_dup_pairs`."""
    q = textstats.quality_filter(docs).select("doc_id")
    qdocs = docs.join(q, "doc_id", "left_semi")
    keep = (
        qdocs.groupBy("text")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    exact_kept = qdocs.join(keep, "doc_id", "left_semi")
    pairs = dedup.lsh_near_dup_pairs(exact_kept, sig_path=sig_path)
    labels = dedup.resolve_near_dups(pairs)
    drop = labels.filter(F.col("label") != F.col("node")).select(
        F.col("node").alias("doc_id")
    )
    out = exact_kept.join(drop, "doc_id", "left_anti")
    if pairs._sig_cache is not None:
        out._sig_cache = pairs._sig_cache
    return out


def corpus_prep(docs: DataFrame, sig_path: str | None = None) -> DataFrame:
    """Full pipeline through the ENCODE engine: survivors are tokenized,
    encoded with auto-selected codecs, decoded back, and fingerprinted —
    so the final value hash proves both the data pipeline and the
    bit-identity of the codec round trip in one gate row.

    Returns (doc_id, source, n_tok, tok_fp).
    """
    survivors = surviving_documents(docs, sig_path=sig_path)
    tok = tokenize_documents(survivors)
    manifest = resolve_manifest(tok, CodecManifest.auto_for(tok.schema, block_rows=4096))
    decoded = decode_table(encode_table(tok, manifest), TOKENS_DDL)
    fp = F.expr(
        f"aggregate(tokens, CAST(0 AS BIGINT), "
        f"(acc, x) -> (acc * 31 + x) % {textstats.FINGERPRINT_MOD})"
    )
    return decoded.select("doc_id", "source", "n_tok", fp.alias("tok_fp"))
