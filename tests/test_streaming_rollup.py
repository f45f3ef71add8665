"""Streaming time-bucket rollup (built-in watermark + tumbling window):
the continuous twin of time_bucket_count. Pins: (1) the drained stream
equals the batch operator over the SAME rows — bucket indexes, labels,
and counts; (2) within-watermark LATE arrivals integrate exactly; (3)
each bucket row is emitted exactly once across epochs (append mode)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from xml2arrow_spark.streaming.rollup_stream import run_rollup_stream
from xml2arrow_spark.streaming.run import stage_ordered
from xml2arrow_spark.streaming.sessionize_stream import EVENTS_DDL, FLUSH_EVENT_ID

WIDTH_S = 3600  # hourly buckets
WIDTH_US = WIDTH_S * 1_000_000


def _mk(spark, ids_ts):
    import datetime

    rows = [
        (eid, datetime.datetime(1970, 1, 1) +
         datetime.timedelta(microseconds=t), 1, "c", 0.0)
        for eid, t in ids_ts
    ]
    return spark.createDataFrame(rows, EVENTS_DDL)


def test_stream_equals_batch_with_late_arrivals(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    os.makedirs(src)
    base = 1_000 * WIDTH_US
    # epoch 1: buckets 1000..1002; epoch 2 carries rows LATE into bucket
    # 1001 (within the 2h watermark) plus fresh rows in 1003
    ep1 = [(i, base + i * (WIDTH_US // 10)) for i in range(25)]
    ep2 = (
        [(100 + i, base + WIDTH_US + i * 1000) for i in range(5)]  # late
        + [(200 + i, base + 3 * WIDTH_US + i * 1000) for i in range(7)]
    )
    flush_t = base + 3 * WIDTH_US + 3 * 3600 * 1_000_000  # past delay+width
    # two sentinel FILES: the watermark a batch observes applies to the
    # NEXT batch, so the second sentinel forces the emitting batch
    stage_ordered(
        [
            _mk(spark, ep1),
            _mk(spark, ep2),
            _mk(spark, [(FLUSH_EVENT_ID, flush_t)]),
            _mk(spark, [(FLUSH_EVENT_ID, flush_t + WIDTH_US)]),
        ],
        src,
    )
    got = {
        r["bucket"]: (r["bucket_start"], r["cnt"])
        for r in run_rollup_stream(
            spark, src, out, WIDTH_S, watermark_delay="2 hours",
            max_files_per_trigger=1,
        ).collect()
    }
    truth: dict = {}
    for _eid, t in ep1 + ep2:
        b = t // WIDTH_US
        truth[b] = (b * WIDTH_US, truth.get(b, (0, 0))[1] + 1)
    assert got == truth
    # every bucket emitted exactly once (append-mode file sink rows)
    import glob

    n_rows = sum(
        pq.read_metadata(p).num_rows
        for p in glob.glob(os.path.join(out, "*.parquet"))
    )
    assert n_rows == len(truth)


def test_stream_matches_time_bucket_count_operator(spark, tmp_path):
    """The streaming rollup and the stored-dataset operator agree bucket
    for bucket on the same event rows (epoch-anchored tumbling windows ==
    floor(ticks/width))."""
    import glob

    from xml2arrow_spark.manifest import CodecManifest
    from xml2arrow_spark.operators.dataset import (
        encode_parquet_dataset,
        time_bucket_count,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    os.makedirs(src)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value",
    )
    last = ev.agg(F.max(F.unix_micros("ts"))).collect()[0][0]
    stage_ordered(
        [
            ev,
            _mk(spark, [(FLUSH_EVENT_ID, last + 3 * 86_400_000_000)]),
            _mk(spark, [(FLUSH_EVENT_ID, last + 4 * 86_400_000_000)]),
        ],
        src,
    )
    got = {
        r["bucket"]: r["cnt"]
        for r in run_rollup_stream(
            spark, src, out, 86_400, watermark_delay="0 seconds",
            max_files_per_trigger=1,
        ).collect()
    }
    # encode from the ORIGINAL micros parquet: a Spark rewrite would store
    # INT96 (nanos through pyarrow), shifting the storage tick unit the
    # width is expressed in — the documented storage-unit contract
    import shutil

    enc_src = str(tmp_path / "enc_src")
    enc_ds = str(tmp_path / "enc_ds")
    os.makedirs(enc_src)
    shutil.copy(
        "/root/testdata/sf0.001/events.parquet",
        os.path.join(enc_src, "events.parquet"),
    )
    encode_parquet_dataset(spark, enc_src, enc_ds)
    want = {
        r["bucket"]: r["cnt"]
        for r in time_bucket_count(
            spark, enc_ds, "ts", 86_400_000_000
        ).collect()
    }
    assert got == want and len(got) > 1
