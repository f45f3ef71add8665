"""Loaders for the driver-provided testdata parquet tables.

One scan per table; the dict-of-DataFrames shape mirrors the reference's
``IndexMap<String, RecordBatch>`` output (/root/reference/src/xml_parser.rs:698-707).
"""

from __future__ import annotations

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_tables(spark, sf_dir: str, names: list[str] | None = None):
    """Load parquet tables from an sf dir as {name: DataFrame}."""
    return {
        name: spark.read.parquet(f"{sf_dir}/{name}.parquet")
        for name in (names or TABLES)
    }
