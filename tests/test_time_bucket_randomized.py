"""Seeded adversarial sweep for time_bucket_count: random value shapes
(sorted / scrambled / duplicate-heavy / null-sprinkled / int64-extreme
ticks), random widths and origins (including negatives and magnitudes
that would WRAP a naive int64 subtraction), random where= composition —
every tally pinned against a pure-python recount on both layouts and
both dispatch paths. The int64-extreme cases pin the overflow contract:
the kernel must either agree with unbounded python arithmetic or refuse
loudly, never silently wrap."""

from __future__ import annotations

import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql.pandas.types import from_arrow_schema

from xml2arrow_spark.manifest import CodecManifest
from xml2arrow_spark.operators.dataset import encode_parquet_dataset, time_bucket_count

I64 = 2**63


def _python_truth(ticks, width, origin, lo=None, hi=None):
    out: dict[int, int] = {}
    for t in ticks:
        if t is None:
            continue
        if lo is not None and t < lo:
            continue
        if hi is not None and t > hi:
            continue
        b = (t - origin) // width
        out[b] = out.get(b, 0) + 1
    return out


def _gen_ticks(rng: random.Random, shape: str, n: int):
    if shape == "clustered":
        base = rng.randrange(-(2**40), 2**40)
        vals = sorted(base + rng.randrange(0, 2**30) for _ in range(n))
    elif shape == "dupes":
        pool = [rng.randrange(-(2**20), 2**20) for _ in range(5)]
        vals = [rng.choice(pool) for _ in range(n)]
    elif shape == "extreme":
        vals = [
            rng.choice([
                -(2**63), 2**63 - 1, rng.randrange(-(2**63), 2**63),
                0, -1, 1,
            ])
            for _ in range(n)
        ]
    else:  # scattered
        vals = [rng.randrange(-(2**50), 2**50) for _ in range(n)]
    return [
        None if rng.random() < 0.1 else v for v in vals
    ]


@pytest.mark.parametrize("layout", ["nested", "wide"])
def test_time_bucket_randomized_sweep(spark, tmp_path, layout):
    rng = random.Random(20260819)
    for case in range(6):
        shape = ["clustered", "dupes", "extreme", "scattered", "clustered",
                 "extreme"][case]
        n = rng.randrange(50, 400)
        ticks = _gen_ticks(rng, shape, n)
        src = str(tmp_path / f"src_{layout}_{case}")
        out = str(tmp_path / f"ds_{layout}_{case}")
        os.makedirs(src)
        tbl = pa.table({
            "t": pa.array(ticks, type=pa.int64()),
            "x": pa.array(np.arange(n, dtype=np.int64)),
        })
        pq.write_table(tbl, os.path.join(src, "part-0.parquet"))
        man = CodecManifest.auto_for(
            from_arrow_schema(tbl.schema), block_rows=64
        )
        encode_parquet_dataset(spark, src, out, manifest=man, layout=layout)

        for _trial in range(3):
            width = rng.choice([1, 7, rng.randrange(1, 2**40), 2**62])
            origin = rng.choice([
                0, -1, rng.randrange(-(2**62), 2**62),
                -(2**62), 2**62,
            ])
            lo = hi = None
            where = None
            if rng.random() < 0.5:
                a = rng.randrange(-(2**50), 2**50)
                b = rng.randrange(-(2**50), 2**50)
                lo, hi = min(a, b), max(a, b)
                where = ("t", lo, hi)
            truth = _python_truth(ticks, width, origin, lo, hi)

            def _bucket_or_start_overflows():
                # refusal is legitimate ONLY when some surviving tick's
                # bucket index or bucket_start label cannot fit int64
                for t in ticks:
                    if t is None:
                        continue
                    if lo is not None and t < lo:
                        continue
                    if hi is not None and t > hi:
                        continue
                    b = (t - origin) // width
                    if not (-I64 <= b < I64):
                        return True
                    if not (-I64 <= origin + b * width < I64):
                        return True
                return False

            for lb in (128 << 20, 0):
                try:
                    got = {
                        r["bucket"]: r["cnt"]
                        for r in time_bucket_count(
                            spark, out, "t", width, origin=origin,
                            local_bytes=lb, where=where,
                        ).collect()
                    }
                except Exception as e:
                    msg = str(e)
                    if not any(
                        k in msg
                        for k in ("int64", "outside", "overflow",
                                  "ARITHMETIC", "Overflow")
                    ):
                        raise
                    assert _bucket_or_start_overflows(), (
                        f"refused without an out-of-range bucket: "
                        f"{(shape, width, origin, where, lb)}: {msg}"
                    )
                    continue
                assert not _bucket_or_start_overflows(), (
                    "answered where a refusal was required",
                    shape, width, origin, where, lb,
                )
                assert got == truth, (
                    layout, case, shape, width, origin, where, lb,
                )
