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

from pyspark.sql import DataFrame, functions as F

from xml2arrow_spark.pipeline import sqlgen as G

__all__ = ["stratified_sample", "deterministic_split"]

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
