"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at the same sf, canonicalizes both result
sets (columns sorted by name, rows sorted by stringified values), and
reports row-count / value equality per query.

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df) -> tuple[int, list[tuple]]:
    """pandas DataFrame -> (n_rows, sorted list of stringified row tuples)."""
    cols = sorted(df.columns)
    rows = []
    for t in df[cols].itertuples(index=False, name=None):
        rows.append(tuple(_canon_val(v) for v in t))
    # repr-keyed sort: total order even with None/mixed-type cells (the
    # driver's pandas sort handles those via Categorical; a plain tuple sort
    # would raise on None < str)
    rows.sort(key=repr)
    return len(rows), rows


def _canon_val(v):
    import numpy as np

    if isinstance(v, (list, tuple, np.ndarray, dict)):
        # The DRIVER's canonicalizer (pandas sort_values) dies on list values
        # ("unhashable type: 'list'", CORRECTNESS_r01). Keep the local gate
        # STRICTER than the driver's, never looser: any array-valued output
        # column is a hard failure here.
        raise TypeError(
            f"array-valued output cell {type(v).__name__} — the driver "
            "canonicalizer cannot sort this; project to scalar columns"
        )
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (np.floating,)):
        return repr(float(v))
    if isinstance(v, float):
        return repr(v)
    return v


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("parity-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        t_spark = time.time() - t0
        if name not in oracles:
            try:
                canon(sdf)
            except TypeError as e:
                failures.append(name)
                print(f"FAIL  {name}: canonicalization: {e}")
                continue
            print(f"ok    {name}: rows-only ({len(sdf)} rows, {t_spark:.1f}s spark)")
            continue
        t0 = time.time()
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        t_duck = time.time() - t0
        try:
            ns, rs = canon(sdf)
            no, ro = canon(odf)
        except TypeError as e:
            failures.append(name)
            print(f"FAIL  {name}: canonicalization: {e}")
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        elif ns != no:
            failures.append(name)
            print(f"FAIL  {name}: rows {ns} vs {no}")
        elif rs != ro:
            failures.append(name)
            bad = next(i for i, (a, b) in enumerate(zip(rs, ro)) if a != b)
            print(f"FAIL  {name}: values differ; first at sorted row {bad}:")
            print(f"      spark : {rs[bad]}")
            print(f"      oracle: {ro[bad]}")
        else:
            print(f"ok    {name}: {ns} rows match ({t_spark:.1f}s spark, {t_duck:.1f}s duck)")
    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    print("\nall queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
