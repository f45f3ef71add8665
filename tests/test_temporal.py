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
