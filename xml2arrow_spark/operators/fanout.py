"""Multi-table fan-out: one source scan -> ordered {name: DataFrame} map.

The reference's single pass feeds N table builders simultaneously and
returns an *ordered* name -> RecordBatch map, excluding structural tables
with no fields (/root/reference/src/xml_parser.rs:698-707;
src/path_registry.rs:61-69). The Spark mapping (SURVEY §2.4 U4) is one scan
persisted once, then one narrow select per output table — every branch reads
the single cached copy (InMemoryRelation is canonicalized by identity, so
cache reuse is guaranteed where ReusedExchange is not; measured in
pipeline/dedup.py).

At cluster scale, replace the persist with a single write of the projected
superset relation and N reads — same shape as the two-phase signature table
in ``lsh_near_dup_pairs(sig_path=...)``.
"""

from __future__ import annotations

from typing import Callable, Mapping, Sequence, Union

from pyspark.sql import Column, DataFrame

__all__ = ["fan_out"]

TableSpec = Union[Sequence[Union[str, Column]], Callable[[DataFrame], DataFrame]]


def fan_out(
    df: DataFrame, tables: Mapping[str, TableSpec], cache: bool = True
) -> dict[str, DataFrame]:
    """One pass over ``df`` -> ordered dict of named projections.

    ``tables`` maps table name -> either a column list (a projection) or a
    callable DataFrame -> DataFrame (arbitrary per-table shaping, e.g. an
    explode). Tables with an EMPTY column list are structural-only and are
    excluded from the output, mirroring the reference's field-less-table
    rule (/root/reference/src/xml_parser.rs:700-704). Insertion order of
    ``tables`` is preserved (the IndexMap analog).

    The source is persisted (``cache=True``) so the N output plans share one
    materialization; callers release it via any returned frame's
    ``_fanout_cache.unpersist()``.
    """
    src = df.persist() if cache else df
    out: dict[str, DataFrame] = {}
    for name, spec in tables.items():
        if callable(spec):
            t = spec(src)
        else:
            if len(spec) == 0:
                continue  # structural table: hierarchy only, no output
            t = src.select(*spec)
        t._fanout_cache = src
        out[name] = t
    return out
