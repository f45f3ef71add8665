"""Similarity search over an embedding column (``array<float>``).

Two paths, mirroring what a 100 TB pipeline actually runs:

- **brute-force cosine top-k** (:func:`cosine_topk`) — the correctness
  baseline. The query vector is a one-row broadcast (Catalyst plans a
  BroadcastNestedLoopJoin; nothing big moves); each partition scores its rows
  with a sequential-fold dot product inside whole-stage codegen and only
  ``k`` candidates per partition survive the final ordering (TakeOrderedAndProject).
- **LSH-bucketed ANN** (:func:`lsh_ann_topk`) — the scale path: deterministic
  random-hyperplane signs bucket every vector into 2^8 cells in one narrow
  pass; search touches only the query's cell. At 1000 executors the bucket
  column doubles as a clustering/partition key so a probe is a
  partition-pruned scan, not a full sweep.

Floats: every expression is a *sequential* fold (left-to-right IEEE adds) +
correctly-rounded sqrt/divide, which DuckDB reproduces bit-for-bit — so these
operators pass the driver's value-hash gate with no rounding fudge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from xml2arrow_spark.pipeline import sqlgen as G

__all__ = ["with_lsh_bucket", "cosine_topk", "lsh_ann_topk", "embedding_near_dup"]

SPARK = "spark"


def _dim(emb_df: DataFrame, emb_col: str) -> int:
    row = emb_df.select(F.size(emb_col).alias("d")).first()
    return int(row["d"])


def with_lsh_bucket(emb_df: DataFrame, emb_col: str = "embedding", dim: int | None = None) -> DataFrame:
    """Add ``bucket`` = sign-of-projection LSH cell id (0..255)."""
    dim = dim or _dim(emb_df, emb_col)
    return emb_df.withColumn("bucket", F.expr(G.lsh_bucket_expr(emb_col, dim, SPARK)))


def cosine_topk(
    emb_df: DataFrame,
    query_id: int,
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k of ``emb_df`` against the row ``query_id``.

    Returns (vec_id, cosine) for the k most similar vectors (excluding the
    query row itself), ties broken by vec_id for a deterministic result set.
    """
    q = emb_df.filter(F.col(id_col) == query_id).select(F.col(emb_col).alias("qv"))
    scored = (
        emb_df.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .withColumn("cosine", F.expr(G.cosine_expr(emb_col, "qv", SPARK)))
    )
    return (
        scored.orderBy(F.desc("cosine"), F.asc(id_col))
        .select(id_col, "cosine")
        .limit(k)
    )


def lsh_ann_topk(
    emb_df: DataFrame,
    query_id: int,
    k: int = 5,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: exact cosine restricted to the query's LSH cell.

    Returns (vec_id, bucket, cosine). The candidate set is the single cell
    sharing all HYPERPLANES projection signs with the query — on a clustered
    table this is a partition-pruned probe.
    """
    dim = _dim(emb_df, emb_col)
    bucketed = with_lsh_bucket(emb_df, emb_col, dim)
    q = bucketed.filter(F.col(id_col) == query_id).select(
        F.col(emb_col).alias("qv"), F.col("bucket").alias("qbucket")
    )
    cand = (
        bucketed.crossJoin(F.broadcast(q))
        .filter((F.col("bucket") == F.col("qbucket")) & (F.col(id_col) != query_id))
        .withColumn("cosine", F.expr(G.cosine_expr(emb_col, "qv", SPARK)))
    )
    return (
        cand.orderBy(F.desc("cosine"), F.asc(id_col))
        .select(id_col, "bucket", "cosine")
        .limit(k)
    )


def embedding_near_dup(
    emb_df: DataFrame,
    threshold: float = 0.3,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucket-restricted.

    The fifth dedup modality (exact / MinHash+LSH / SimHash / n-gram Jaccard
    being the others): candidate pairs are generated ONLY within a
    random-hyperplane LSH cell (same trick as :func:`lsh_ann_topk` — at scale
    the self-join shuffles each cell once instead of cross-joining the
    table), then verified with the exact sequential-fold cosine. Returns
    (vec_a, vec_b, cosine) with vec_a < vec_b.

    The bucketed relation is persisted so both self-join sides read one
    cached copy (same ReusedExchange caveat as
    :func:`xml2arrow_spark.pipeline.dedup.lsh_near_dup_pairs`).
    """
    dim = _dim(emb_df, emb_col)
    bucketed = with_lsh_bucket(emb_df, emb_col, dim).select(
        id_col, emb_col, "bucket"
    ).persist()
    a, b = bucketed.alias("a"), bucketed.alias("b")
    pairs = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("vec_a"),
        F.col(f"b.{id_col}").alias("vec_b"),
        F.expr(G.cosine_expr(f"a.{emb_col}", f"b.{emb_col}", SPARK)).alias("cosine"),
    )
    return pairs.filter(F.col("cosine") >= threshold)
