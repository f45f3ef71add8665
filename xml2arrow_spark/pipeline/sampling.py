"""Deterministic sampling / splitting for training-data pipelines.

Both operators ride one portable hash (:func:`sqlgen.sample_hash_expr`):
a per-id bucket 0..999 computed with small exact integer arithmetic, so

- the SAME rows are selected on every run, every cluster size, and every
  engine (the DuckDB oracle reproduces the selection bit-for-bit — a
  ``rand(seed)`` sample never could: no two engines share a PRNG stream);
- raising a fraction GROWS the previous sample monotonically (bucket
  membership never changes), the property reproducible-data-curation
  work depends on;
- the filter is one narrow codegen'd predicate — Catalyst pushes it into
  the scan, no shuffle, no RNG state to coordinate across executors.

The per-stratum fraction table is a driver-side CASE chain (strata are
low-cardinality by definition); at thousands of strata swap it for a
broadcast join against a fractions DataFrame — same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from xml2arrow_spark.pipeline import sqlgen as G

__all__ = [
    "stratified_sample",
    "deterministic_split",
    "mixture_sample",
    "shuffle_order",
]

SPARK = "spark"


def stratified_sample(
    docs: DataFrame,
    fractions_milli: dict[str, int],
    id_col: str = "doc_id",
    strata_col: str = "source",
    default_milli: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sample: keep a row iff its hash bucket
    falls below the stratum's fraction (in 1/1000ths). Strata absent from
    ``fractions_milli`` keep ``default_milli``/1000 of their rows."""
    bucket = F.expr(G.sample_hash_expr(id_col, SPARK))
    frac = F.lit(int(default_milli))
    for stratum, milli in sorted(fractions_milli.items()):
        frac = F.when(F.col(strata_col) == stratum, F.lit(int(milli))).otherwise(frac)
    return docs.filter(bucket < frac)


def deterministic_split(
    docs: DataFrame,
    splits_milli: dict[str, int],
    id_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split (train/val/test...) by
    hash-bucket RANGES — jointly exhaustive over the given fractions, and
    stable: a row never migrates between splits across runs. Fractions
    must sum to <= 1000; rows in the unassigned tail bucket range are
    DROPPED (a holdout), so ``sum == 1000`` partitions everything.

    Split boundaries walk ``splits_milli`` in sorted-name order so the
    assignment is a pure function of (id, fractions), not dict order."""
    total = sum(splits_milli.values())
    if total > G.SAMPLE_MOD:
        raise ValueError(f"split fractions sum to {total} > {G.SAMPLE_MOD} milli")
    bucket = F.expr(G.sample_hash_expr(id_col, SPARK))
    lo = 0
    expr = F.lit(None).cast("string")
    # wrap forward, so the LAST-built when is outermost; precedence is
    # irrelevant because the ranges are disjoint by construction
    ranges = []
    for name, milli in sorted(splits_milli.items()):
        ranges.append((name, lo, lo + int(milli)))
        lo += int(milli)
    for name, a, b in ranges:
        expr = F.when((bucket >= a) & (bucket < b), F.lit(name)).otherwise(expr)
    out = docs.withColumn(split_col, expr)
    return out.filter(F.col(split_col).isNotNull())


def mixture_sample(
    docs: DataFrame,
    weights_milli: dict[str, int],
    id_col: str = "doc_id",
    strata_col: str = "source",
    counts: dict[str, int] | None = None,
) -> DataFrame:
    """Resample the corpus toward a TARGET output mixture (data-mixing /
    source-reweighting, the knob LLM training runs turn on every corpus):
    ``weights_milli`` gives the desired per-source proportions of the
    OUTPUT (only ratios matter). The achievable total is capped by the
    binding source — the one whose corpus share falls shortest of its
    target share — so the sampler solves ``T = min_s floor(n_s * 1000 /
    w_s)`` (the largest output respecting keep-fraction <= 1 everywhere)
    and keeps fraction ``f_s = floor(T * w_s / n_s)`` milli of source s.
    All arithmetic is exact non-negative integer floor division, so the
    DuckDB oracle reproduces the fractions — and therefore the row set —
    bit-for-bit. Sources not in ``weights_milli`` are dropped (weight 0).

    ``counts`` injects per-source row counts (production: read them from
    table statistics / the metadata rollup instead of a counting scan);
    omitted, one narrow map-side-combined groupBy computes them — the
    collect is one row per stratum, KB-scale by definition. The returned
    frame carries ``f_milli`` (the applied fraction) per row. Reference
    analog: none — the reference has no sampling surface (SURVEY §2.5
    covers only its stop-at-N early termination); this is a beyond-
    reference LLM-pipeline operator.
    """
    if not weights_milli:
        raise ValueError("weights_milli must name at least one source")
    if any(w < 0 for w in weights_milli.values()):
        raise ValueError("mixture weights must be non-negative")
    live = {s: w for s, w in weights_milli.items() if w > 0}
    if not live:
        raise ValueError("at least one mixture weight must be positive")
    if counts is None:
        rows = (
            docs.filter(F.col(strata_col).isin(list(live)))
            .groupBy(strata_col)
            .count()
            .collect()  # one row per stratum: KB-scale metadata
        )
        counts = {r[strata_col]: r["count"] for r in rows}
    missing = sorted(s for s in live if not counts.get(s))
    if missing:
        raise ValueError(
            f"mixture sources absent from the corpus: {missing} — a silent "
            "skip would change every other source's share"
        )
    total = min((counts[s] * G.SAMPLE_MOD) // w for s, w in live.items())
    fracs = {s: (total * w) // counts[s] for s, w in live.items()}
    bucket = F.expr(G.sample_hash_expr(id_col, SPARK))
    frac = F.lit(0)
    for stratum, milli in sorted(fracs.items()):
        frac = F.when(F.col(strata_col) == stratum, F.lit(milli)).otherwise(frac)
    return docs.filter(bucket < frac).withColumn("f_milli", frac)


def shuffle_order(
    docs: DataFrame,
    n_shards: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic pseudo-random training order: every row gets a
    ``(shard, pos)`` pair defining a total order (read shards in index
    order, rows by ``pos`` within each) that is a pure function of the id
    — reproducible across runs, engines, and cluster sizes, unlike an
    ``ORDER BY rand()`` shuffle. Shard = shuffle-hash mod ``n_shards``;
    pos = dense 0-based rank within the shard by (shuffle-hash, id).

    Scale shape: one hash exchange on ``shard`` + an in-partition sort —
    never a global single-partition window. Pick ``n_shards`` well above
    the executor count so shards stay memory-sized and the sort
    parallelizes; at 100 TB each shard is an independent unit a training
    loader can stream.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    rh = F.expr(G.shuffle_hash_expr(id_col, SPARK))
    out = docs.withColumn("_rh", rh).withColumn(
        "shard", (F.col("_rh") % F.lit(int(n_shards))).cast("int")
    )
    w = Window.partitionBy("shard").orderBy("_rh", id_col)
    return (
        out.withColumn("pos", (F.row_number().over(w) - F.lit(1)).cast("long"))
        .drop("_rh")
    )
