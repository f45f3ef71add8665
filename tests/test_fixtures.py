"""FIXTURES.md F2 (nested-linkage stations/measurements) and F3
(typed-nulls semantics), pinned end-to-end.

F2 mirrors the reference's canonical weather-stations example
(/root/reference/README.md:210-394, tests/integration_tests.rs:429-500): the
parent-index ``<level>`` columns become a join key, the per-parent
``measurement_idx`` restarting at 0 is ``posexplode``'s position, and the
float affine transform value*scale + offset
(/root/reference/src/xml_parser.rs:252-291) is a Catalyst expression.

F3 pins the null contract derived from the reference
(/root/reference/src/xml_parser.rs:327-338): null round-trips as null
through EVERY codec path, empty string != null, whitespace-only strings are
values (the engine never parses — its inputs are typed).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row, functions as F

from xml2arrow_spark.manifest import CodecManifest
from xml2arrow_spark.operators.encode import decode_table, encode_table
from xml2arrow_spark.operators.verify import verify_roundtrip


# -- F2: stations/measurements nested linkage --------------------------------


@pytest.fixture(scope="module")
def stations(spark):
    rows = [
        Row(station_idx=i, id=f"ST{i:03d}", latitude=40.0 + i, longitude=-3.0 - i,
            elevation=100.0 * i)
        for i in range(10)
    ]
    return spark.createDataFrame(rows)


@pytest.fixture(scope="module")
def measurements(spark):
    rows = []
    for s in range(10):
        for m in range(2 + s % 4):  # 2-5 rows per station, idx restarts at 0
            rows.append(
                Row(station_idx=s, measurement_idx=m, timestamp=f"2026-01-{m+1:02d}",
                    temperature=20.0 + s + 0.1 * m, pressure=1013.0 + m,
                    humidity=50.0 + s)
            )
    return spark.createDataFrame(rows)


def test_f2_join_reconstructs_hierarchy(stations, measurements):
    joined = measurements.join(stations, "station_idx")
    assert joined.count() == measurements.count()  # every child has a parent
    # per-parent counter restarts at 0 and is dense (the <measurement>
    # semantics of /root/reference/src/xml_parser.rs:472-489)
    from pyspark.sql import Window

    w = Window.partitionBy("station_idx").orderBy("measurement_idx")
    chk = measurements.withColumn("rn", F.row_number().over(w) - 1)
    assert chk.filter(F.col("rn") != F.col("measurement_idx")).count() == 0


def test_f2_posexplode_roundtrip_matches_indices(spark, measurements):
    """collect_list -> posexplode reproduces measurement_idx exactly."""
    nested = measurements.groupBy("station_idx").agg(
        F.sort_array(F.collect_list(F.struct("measurement_idx", "timestamp"))).alias("ms")
    )
    re_flat = nested.select(
        "station_idx", F.posexplode("ms").alias("pos", "m")
    ).select("station_idx", "pos", F.col("m.measurement_idx").alias("midx"))
    assert re_flat.filter(F.col("pos") != F.col("midx")).count() == 0


def test_f2_affine_transform_matches_reference_semantics(measurements):
    """temperature +273.15 (offset), pressure x100 (scale) to 1e-10."""
    out = measurements.select(
        (F.col("temperature") + F.lit(273.15)).alias("temp_k"),
        (F.col("pressure") * F.lit(100.0)).alias("pressure_pa"),
        "temperature", "pressure",
    ).collect()
    for r in out:
        assert math.isclose(r.temp_k, r.temperature + 273.15, abs_tol=1e-10)
        assert math.isclose(r.pressure_pa, r.pressure * 100.0, abs_tol=1e-10)


def test_f2_measurements_encode_roundtrip(spark, measurements):
    """The fixture's mixed int/string/double schema round-trips bit-identical
    through the encode engine (floats now first-class)."""
    ddl = ("station_idx bigint, measurement_idx bigint, timestamp string, "
           "temperature double, pressure double, humidity double")
    df = measurements.select(
        "station_idx", "measurement_idx", "timestamp",
        "temperature", "pressure", "humidity",
    )
    manifest = CodecManifest.auto_for(df.schema, block_rows=7)
    decoded = decode_table(encode_table(df, manifest), ddl)
    assert decoded.exceptAll(df).count() == 0
    assert df.exceptAll(decoded).count() == 0


# -- F3: typed nulls ----------------------------------------------------------


@pytest.fixture(scope="module")
def typed_nulls(spark):
    rows = []
    for i in range(100):
        rows.append(
            Row(
                id=i,
                s=(None if i % 5 == 0 else ("" if i % 5 == 1 else ("   " if i % 5 == 2 else f"val{i}"))),
                i=(None if i % 4 == 0 else i * 3),
                f=(None if i % 3 == 0 else i * 1.5),
                b=(None if i % 6 == 0 else i % 2 == 1),
            )
        )
    from pyspark.sql.types import (
        BooleanType, DoubleType, IntegerType, LongType, StringType,
        StructField, StructType,
    )

    schema = StructType([
        StructField("id", LongType(), False),
        StructField("s", StringType(), True),
        StructField("i", IntegerType(), True),
        StructField("f", DoubleType(), True),
        StructField("b", BooleanType(), True),
    ])
    return spark.createDataFrame(rows, schema)


def test_f3_null_roundtrip_all_types(spark, typed_nulls):
    ddl = "id bigint, s string, i int, f double, b boolean"
    manifest = CodecManifest.auto_for(typed_nulls.schema, block_rows=17)
    decoded = decode_table(encode_table(typed_nulls, manifest), ddl)
    result = verify_roundtrip(typed_nulls, decoded, key="id")
    assert result["ok"], result
    # null counts preserved per column
    for c in ["s", "i", "f", "b"]:
        assert (
            decoded.filter(F.col(c).isNull()).count()
            == typed_nulls.filter(F.col(c).isNull()).count()
        ), c


def test_f3_empty_string_is_not_null(spark, typed_nulls):
    ddl = "id bigint, s string, i int, f double, b boolean"
    manifest = CodecManifest.auto_for(typed_nulls.schema, block_rows=17)
    decoded = decode_table(encode_table(typed_nulls, manifest), ddl)
    assert (
        decoded.filter(F.col("s") == "").count()
        == typed_nulls.filter(F.col("s") == "").count()
        > 0
    )
    assert (
        decoded.filter(F.col("s") == "   ").count()
        == typed_nulls.filter(F.col("s") == "   ").count()
        > 0
    )


def test_f3_float_specials_roundtrip_bitwise():
    """NaN payloads, infinities, signed zero survive plain_float exactly."""
    import numpy as np

    from xml2arrow_spark.codecs import decode_values, encode_values

    v = np.array([0.0, -0.0, np.inf, -np.inf, np.nan, 1e-308, 1.5], dtype=np.float64)
    meta, blob = encode_values("plain_float", v)
    out = decode_values(meta, blob)
    assert out.tobytes() == v.tobytes()  # bit-identical, incl. NaN payload
