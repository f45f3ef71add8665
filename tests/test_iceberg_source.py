"""Iceberg-aware source gating: no catalog in this sandbox, so every entry
point must detect that and take the parquet path (the layouts are
write-compatible by design; see sources/iceberg.py)."""

from xml2arrow_spark.sources.iceberg import iceberg_available, read_table, write_table


def test_no_catalog_detected(spark):
    assert iceberg_available(spark) is False


def test_read_write_fall_back_to_parquet(spark, tmp_path):
    path = str(tmp_path / "tbl")
    df = spark.range(0, 100).selectExpr("id", "cast(id % 7 as string) s")
    write_table(df, path, mode="append")
    got = read_table(spark, path)
    assert got.count() == 100
    write_table(df, path, mode="append")  # append mode appends
    assert read_table(spark, path).count() == 200


def test_read_table_matches_plain_parquet(spark, sf_dir):
    a = read_table(spark, f"{sf_dir}/documents.parquet").count()
    b = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert a == b
