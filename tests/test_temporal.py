"""Temporal types through the codec engine: timestamps (any unit, tz-aware
or naive) and date32 ride the integer codec family as epoch ticks, decode
bit-identically to the ORIGINAL arrow type, take integer zone stats in the
storage unit (time-range pruning), and the in-kernel row selection accepts
tick or datetime bounds."""

from __future__ import annotations

import datetime
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from xml2arrow_spark.errors import EncodeTypeError
from xml2arrow_spark.operators.blocks import (
    decode_column,
    encode_column,
    row_match_mask,
)


@pytest.mark.parametrize(
    "arr",
    [
        pa.array([1700000000000000, None, 3, 4], type=pa.timestamp("us", tz="UTC")),
        pa.array([1700000000000000, None, 3, 4], type=pa.timestamp("us")),
        pa.array([1, 2, None, 4], type=pa.timestamp("ns", tz="America/New_York")),
        pa.array([10**15 + i for i in range(100)], type=pa.timestamp("ms")),
        pa.array([19000, None, 19002], type=pa.date32()),
        pa.array([None, None], type=pa.timestamp("us")),
        pa.array([], type=pa.date32()),
    ],
    ids=["us_utc", "us_naive", "ns_tz", "ms_dense", "date32", "all_null", "empty"],
)
def test_block_roundtrip_bit_identical(arr):
    _resolved, meta, payload = encode_column(arr, "auto")
    back = decode_column(meta, payload)
    assert back.type == arr.type
    assert back.equals(arr)


def test_block_roundtrip_cascade_and_forced_codecs():
    ts = pa.array(
        [1700000000000000 + 1000 * i for i in range(4096)],
        type=pa.timestamp("us"),
    )
    for codec in ["auto", "delta", "for", "plain", "auto+zstd", "delta+lz4"]:
        _r, meta, payload = encode_column(ts, codec)
        assert decode_column(meta, payload).equals(ts)


def test_date64_refused():
    with pytest.raises(EncodeTypeError):
        encode_column(pa.array([1], type=pa.date64()), "auto")


def test_row_match_mask_ticks_and_datetime_bounds():
    ts = pa.array(
        [1_000_000, 2_000_000, None, 4_000_000], type=pa.timestamp("us")
    )
    m = row_match_mask(ts, None, 2_000_000, 4_000_000)
    assert m.to_pylist() == [False, True, False, True]
    m2 = row_match_mask(
        ts, None,
        datetime.datetime(1970, 1, 1, 0, 0, 2),
        datetime.datetime(1970, 1, 1, 0, 0, 4),
    )
    assert m2.to_pylist() == [False, True, False, True]
    d = pa.array([100, 200, None], type=pa.date32())
    m3 = row_match_mask(d, [200], None, None)
    assert m3.to_pylist() == [False, True, False]
    m4 = row_match_mask(d, None, datetime.date(1970, 4, 11), None)  # day 100
    assert m4.to_pylist() == [True, True, False]
    assert row_match_mask(ts, None, 10**18, None) is None  # no match: skip


N = 600


@pytest.fixture(scope="module")
def tds(spark, tmp_path_factory):
    """Encoded dataset with a time-clustered timestamp + date column."""
    base = str(tmp_path_factory.mktemp("tds"))
    src = os.path.join(base, "src")
    out = os.path.join(base, "ds")
    os.makedirs(src)
    start = 1_704_067_200_000_000  # 2024-01-01 in epoch micros
    ts = np.arange(N, dtype=np.int64) * 60_000_000 + start
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(N, dtype=np.int64)),
            "ts": pa.array(ts, type=pa.timestamp("us")),
            "day": pa.array((ts // 86_400_000_000).astype(np.int32),
                            type=pa.date32()),
        }
    )
    pq.write_table(tbl, os.path.join(src, "part-0.parquet"))
    from xml2arrow_spark.manifest import CodecManifest
    from xml2arrow_spark.operators.dataset import encode_parquet_dataset
    from pyspark.sql.pandas.types import from_arrow_schema

    man = CodecManifest.auto_for(from_arrow_schema(tbl.schema), block_rows=100)
    encode_parquet_dataset(spark, src, out, manifest=man, layout="wide")
    return out, tbl


def test_dataset_roundtrip_and_zone_stats(spark, tds):
    out, tbl = tds
    from xml2arrow_spark.operators.dataset import decode_dataset

    back = decode_dataset(spark, out).toPandas().sort_values("event_id")
    assert list(back["ts"]) == tbl.column("ts").to_pylist()
    assert list(back["day"]) == tbl.column("day").to_pylist()
    # integer zone stats in the storage unit, recorded per block
    import glob

    f = sorted(glob.glob(os.path.join(out, "blocks", "*.parquet")))[0]
    st = pq.read_table(f, columns=["c_ts__vmin_i", "c_ts__vmax_i",
                                   "c_day__vmin_i", "c_day__vmax_i"])
    assert st.column(0)[0].as_py() == tbl.column("ts")[0].cast(pa.int64()).as_py()
    assert st.column(2)[0].as_py() == tbl.column("day")[0].cast(pa.int32()).as_py()


def test_dataset_time_range_selection(spark, tds):
    out, tbl = tds
    from xml2arrow_spark.operators.dataset import decode_dataset

    lo = tbl.column("ts")[100].cast(pa.int64()).as_py()
    hi = tbl.column("ts")[299].cast(pa.int64()).as_py()
    got = decode_dataset(
        spark, out, columns=["event_id"],
        zone_filter=("ts", lo, hi), row_filter=("ts", lo, hi),
    )
    assert sorted(r["event_id"] for r in got.collect()) == list(range(100, 300))
    # date-typed filter column with a date32 tick range
    got2 = decode_dataset(
        spark, out, columns=["event_id"],
        row_filter=("day", 19723, 19723),  # one calendar day of rows
    ).count()
    truth = sum(
        1 for v in tbl.column("day").to_pylist()
        if v == datetime.date.fromordinal(datetime.date(1970, 1, 1).toordinal() + 19723)
    )
    assert got2 == truth and got2 > 0


def test_selector_picks_delta_for_event_times(spark, tds):
    out, tbl = tds
    from pyspark.sql.pandas.types import from_arrow_schema

    from xml2arrow_spark.manifest import CodecManifest
    from xml2arrow_spark.plans.selector import resolve_manifest

    df = spark.createDataFrame(tbl.to_pandas())
    man = resolve_manifest(df, CodecManifest.auto_for(from_arrow_schema(tbl.schema)))
    assert man.columns["ts"].codec == "delta"


def test_temporal_group_keys(spark, tds):
    """The everyday time rollup — rows / sums per day — through the codec
    streams: a date32 GROUP BY key works on both dispatch paths and both
    kernels (group_count tallies, group_sum folds), matching a decode +
    Spark groupBy to the row."""
    out, tbl = tds
    from pyspark.sql import functions as F

    from xml2arrow_spark.operators.dataset import (
        decode_dataset,
        group_count,
        group_sum,
    )

    truth_cnt = {
        r["day"]: r["count"]
        for r in decode_dataset(spark, out, columns=["day"])
        .groupBy("day").count().collect()
    }
    truth_sum = {
        r["day"]: (r["cnt"], r["s"])
        for r in decode_dataset(spark, out, columns=["day", "event_id"])
        .groupBy("day").agg(
            F.count(F.lit(1)).alias("cnt"), F.sum("event_id").alias("s")
        ).collect()
    }
    for lb in (128 << 20, 0):
        got_cnt = {
            r["day"]: r["cnt"]
            for r in group_count(spark, out, "day", local_bytes=lb).collect()
        }
        assert got_cnt == truth_cnt
        got_sum = {
            r["day"]: (r["cnt"], r["sum_a"])
            for r in group_sum(
                spark, out, "day", "event_id", local_bytes=lb
            ).collect()
        }
        assert got_sum == truth_sum


DAY_US = 86_400_000_000


def test_time_bucket_count_matches_decode(spark, tds):
    """Fixed-width bucket rollup on the codec streams: exact vs the
    decode+floor+groupBy truth on both dispatch paths; where= composes;
    negative buckets floor correctly left of the origin."""
    out, tbl = tds
    from xml2arrow_spark.operators.dataset import time_bucket_count

    ticks = tbl.column("ts").cast(pa.int64()).to_pylist()
    truth: dict[int, int] = {}
    for t in ticks:
        truth[t // DAY_US] = truth.get(t // DAY_US, 0) + 1
    for lb in (128 << 20, 0):
        got = {
            r["bucket"]: r["cnt"]
            for r in time_bucket_count(
                spark, out, "ts", DAY_US, local_bytes=lb
            ).collect()
        }
        assert got == truth
    lo, hi = ticks[50], ticks[249]
    tw: dict[int, int] = {}
    for t in ticks:
        if lo <= t <= hi:
            tw[t // DAY_US] = tw.get(t // DAY_US, 0) + 1
    gw = {
        r["bucket"]: r["cnt"]
        for r in time_bucket_count(
            spark, out, "ts", DAY_US, where=("ts", lo, hi)
        ).collect()
    }
    assert gw == tw
    # origin mid-data: buckets go negative, floor (not trunc) semantics
    origin = ticks[300]
    gn = {
        r["bucket"]: (r["bucket_start"], r["cnt"])
        for r in time_bucket_count(
            spark, out, "ts", DAY_US, origin=origin
        ).collect()
    }
    tn: dict[int, int] = {}
    for t in ticks:
        tn[(t - origin) // DAY_US] = tn.get((t - origin) // DAY_US, 0) + 1
    assert {b: c for b, (_s, c) in gn.items()} == tn
    assert all(s == origin + b * DAY_US for b, (s, _c) in gn.items())
    assert min(gn) < 0
    # date32 column buckets in days
    gd = {
        r["bucket"]: r["cnt"]
        for r in time_bucket_count(spark, out, "day", 7).collect()
    }
    td: dict[int, int] = {}
    for v in tbl.column("day").cast(pa.int32()).to_pylist():
        td[v // 7] = td.get(v // 7, 0) + 1
    assert gd == td


@pytest.mark.parametrize("layout", ["nested", "wide"])
def test_time_bucket_count_claims_from_metadata(spark, tmp_path, layout):
    """Time-clustered blocks whose bounds land in one bucket answer from
    zone metadata alone — pinned the hard way: tampering EVERY payload
    byte stream leaves the rollup exact while decode refuses via CRC."""
    import shutil

    from pyspark.sql.pandas.types import from_arrow_schema

    from xml2arrow_spark.manifest import CodecManifest
    from xml2arrow_spark.operators.dataset import (
        decode_dataset,
        encode_parquet_dataset,
        time_bucket_count,
    )

    src = str(tmp_path / f"src_{layout}")
    out = str(tmp_path / f"ds_{layout}")
    os.makedirs(src)
    n = 300  # 100 rows per day, block_rows=100 -> every block one bucket
    start = 1_704_067_200_000_000
    # irregular intra-day jitter so payloads are non-empty (a constant
    # stride delta-packs to ZERO bytes — nothing to tamper)
    ts = [
        start + (i // 100) * DAY_US + (i % 100) * 1000 + (i * i) % 997
        for i in range(n)
    ]
    tbl = pa.table({
        "event_id": pa.array(
            np.array([(i * 7919) % n for i in range(n)], dtype=np.int64)
        ),
        "ts": pa.array(np.array(ts, dtype=np.int64), type=pa.timestamp("us")),
    })
    pq.write_table(tbl, os.path.join(src, "part-0.parquet"))
    man = CodecManifest.auto_for(from_arrow_schema(tbl.schema), block_rows=100)
    encode_parquet_dataset(spark, src, out, manifest=man, layout=layout)

    bdir = os.path.join(out, "blocks")
    n_flipped = 0
    for fn in os.listdir(bdir):
        if not fn.endswith(".parquet"):
            continue
        fpath = os.path.join(bdir, fn)
        t0 = pq.read_table(fpath)
        rows = t0.to_pylist()
        for r in rows:
            if layout == "nested":
                for ci in range(len(r["cols"])):
                    payload = bytearray(r["cols"][ci]["data"])
                    if payload:
                        payload[len(payload) // 2] ^= 0x01
                        r["cols"][ci]["data"] = bytes(payload)
                        n_flipped += 1
            else:
                for col in ("c_event_id__data", "c_ts__data"):
                    payload = bytearray(r[col])
                    if payload:
                        payload[len(payload) // 2] ^= 0x01
                        r[col] = bytes(payload)
                        n_flipped += 1
        pq.write_table(pa.Table.from_pylist(rows, schema=t0.schema), fpath)
        crc = os.path.join(bdir, "." + fn + ".crc")
        if os.path.exists(crc):
            os.remove(crc)
    assert n_flipped > 0  # a zero-byte payload would make this test vacuous
    spark.catalog.refreshByPath(bdir)

    base = start // DAY_US
    for lb in (128 << 20, 0):
        got = {
            r["bucket"]: r["cnt"]
            for r in time_bucket_count(
                spark, out, "ts", DAY_US, local_bytes=lb
            ).collect()
        }
        assert got == {base: 100, base + 1: 100, base + 2: 100}
    with pytest.raises(Exception):
        decode_dataset(spark, out).collect()


def test_temporal_survives_checkpoint_mutations(spark, tmp_path):
    """Timestamp columns ride the row-level checkpoint dataset through a
    full upsert + delete cycle bit-identically (the unit-rewrite path
    re-encodes temporal blocks like any other), and point lookups
    project them."""
    from pyspark.sql import functions as F

    from xml2arrow_spark.manifest import CodecManifest
    from xml2arrow_spark.operators.checkpoint import (
        delete_rows,
        encode_dataset,
        lookup_rows,
        read_encoded_dataset,
        upsert_rows,
    )

    ds = str(tmp_path / "ds")
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select(
            F.col("event_id").cast("string").alias("doc_id"),
            "ts", "event_type",
        )
    )
    man = CodecManifest.auto_for(ev.schema, block_rows=256)
    encode_dataset(ev, ds, man, n_units=4)
    batch = ev.filter("doc_id LIKE '%7'").withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 1 HOUR")
    )
    upsert_rows(batch, ds)
    delete_rows(ev.filter("doc_id LIKE '%3'").select("doc_id"), ds)
    truth = ev.filter("doc_id NOT LIKE '%3'").withColumn(
        "ts",
        F.when(
            F.col("doc_id").like("%7"),
            F.col("ts") + F.expr("INTERVAL 1 HOUR"),
        ).otherwise(F.col("ts")),
    )
    back = read_encoded_dataset(spark, ds)
    mism = (
        truth.alias("a").join(back.alias("b"), "doc_id", "full_outer")
        .filter(~F.col("a.ts").eqNullSafe(F.col("b.ts"))).count()
    )
    assert mism == 0
    assert back.count() == truth.count()
    probe = spark.createDataFrame([("17",), ("20",)], "doc_id string")
    got = {
        r["doc_id"]: r["ts"]
        for r in lookup_rows(probe, ds, columns=["doc_id", "ts"]).collect()
    }
    want = {
        r["doc_id"]: r["ts"]
        for r in truth.filter(F.col("doc_id").isin("17", "20")).collect()
    }
    assert got == want and len(got) == 2


def test_time_bucket_count_validation(spark, tds):
    out, _tbl = tds
    from xml2arrow_spark.operators.dataset import time_bucket_count

    with pytest.raises(ValueError, match="positive tick int"):
        time_bucket_count(spark, out, "ts", 0)
    with pytest.raises(ValueError, match="positive tick int"):
        time_bucket_count(spark, out, "ts", 1.5)
    with pytest.raises(ValueError, match="lacks encoded column"):
        time_bucket_count(spark, out, "nope", DAY_US)


def test_count_where_temporal_ticks(spark, tds):
    """Time-range predicates on the metadata-accelerated aggregates:
    bounds are storage-unit tick ints (zone stats + mask kernel share the
    unit, so classification and evaluation are exact); datetime objects
    are refused here (only the kernel knows a block's actual arrow unit).
    The time-clustered fixture exercises pruned/interior/boundary."""
    out, tbl = tds
    import pyarrow.compute as pc

    from xml2arrow_spark.operators.dataset import count_where, group_count

    ticks = tbl.column("ts").cast(pa.int64())
    lo = ticks[100].as_py()
    hi = ticks[399].as_py()
    for lb in (128 << 20, 0):
        r = count_where(
            spark, out, ("ts", lo, hi), agg_col="event_id", local_bytes=lb
        ).collect()[0].asDict()
        assert r["n_match"] == 300
        assert r["n_sum"] == sum(range(100, 400))
        assert (r["n_min"], r["n_max"]) == (100, 399)
        assert r["n_pruned"] > 0 and r["n_interior"] > 0
    # day-granularity range on the date32 column (days are the unit)
    dlo = tbl.column("day")[0].cast(pa.int32()).as_py()
    n0 = int(pc.sum(pc.equal(tbl.column("day").cast(pa.int32()),
                             dlo)).as_py())
    r = count_where(spark, out, ("day", dlo, dlo)).collect()[0].asDict()
    assert r["n_match"] == n0 > 0
    # filtered GROUP BY composes the same classification
    g = {
        r["day"]: r["cnt"]
        for r in group_count(spark, out, "day", where=("ts", lo, hi)).collect()
    }
    assert sum(g.values()) == 300
    # datetime bounds refuse with the unit explanation
    import datetime

    with pytest.raises(ValueError, match="tick"):
        count_where(spark, out, ("ts", datetime.datetime(2024, 1, 1), None))
