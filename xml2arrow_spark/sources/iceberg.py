"""Iceberg-aware table IO with a parquet-directory fallback.

The north-rule workload ingests an *Iceberg table* of pre-tokenized
sequences. On a real cluster the Iceberg runtime jar + a catalog config make
that `spark.read.format("iceberg")`; this sandbox has neither, so every
entry point gates on catalog availability and falls back to the
parquet-directory layout the rest of the engine already uses (the layouts
are write-compatible: `operators/dataset.py` keeps data/metadata split
Iceberg-style so a real catalog can adopt the directory).

What Iceberg would add at scale — and where the engine already has the
hook:

- **snapshot row counts** (``expected_n`` for the LSH geometry,
  :func:`xml2arrow_spark.pipeline.similarity.with_lsh_bands`) come from
  ``SELECT * FROM tbl.snapshots`` instead of a count() job;
- **file-level planning** (`sources/files.py::plan_parquet_tasks`) maps to
  the Iceberg `files` metadata table — same (path, bytes) LPT binning, no
  directory listing;
- **resume lineage** (`operators/checkpoint.py` manifest rows) becomes an
  append-only Iceberg metadata table with snapshot-ordered commits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["iceberg_available", "read_table", "write_table"]


def iceberg_available(spark: SparkSession) -> bool:
    """True iff an Iceberg catalog is configured AND the runtime jar loads."""
    conf = spark.conf
    try:
        catalogs = [
            k for k in ("spark.sql.catalog.spark_catalog", "spark.sql.catalog.local")
            if "iceberg" in (conf.get(k, "") or "")
        ]
    except Exception:
        catalogs = []
    if not catalogs:
        return False
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: B018 — probe the jar
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, table_or_path: str) -> DataFrame:
    """Read an Iceberg table by name when a catalog is configured, else a
    parquet file/directory by path. One entry point for both environments so
    pipeline code never branches."""
    if iceberg_available(spark) and "/" not in table_or_path:
        return spark.read.format("iceberg").load(table_or_path)
    return spark.read.parquet(table_or_path)


def write_table(
    df: DataFrame, table_or_path: str, mode: str = "append"
) -> None:
    """Write to an Iceberg table (catalog present) or parquet path."""
    spark = df.sparkSession
    if iceberg_available(spark) and "/" not in table_or_path:
        df.writeTo(table_or_path).append() if mode == "append" else (
            df.writeTo(table_or_path).createOrReplace()
        )
        return
    df.write.mode("overwrite" if mode != "append" else "append").parquet(
        table_or_path
    )
