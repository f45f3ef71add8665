"""Per-block zone maps: min/max recorded at encode time prune whole blocks
at decode (parquet-row-group semantics at block granularity); on the wide
layout the zone columns are top-level parquet columns, so the same stats
ALSO push down to parquet row-group statistics."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from xml2arrow_spark.manifest import CodecManifest, ColumnPolicy
from xml2arrow_spark.operators.encode import decode_table, encode_table, prune_blocks


@pytest.fixture(scope="module")
def sorted_df(spark):
    # ids 0..9999 in order, 1 partition -> blocks carry disjoint id ranges
    pdf = pd.DataFrame(
        {
            "id": np.arange(10_000, dtype=np.int64),
            "price": np.round(np.arange(10_000) * 0.01, 2),
        }
    )
    return spark.createDataFrame(pdf).coalesce(1)


@pytest.fixture(scope="module")
def blocks(spark, sorted_df):
    man = CodecManifest.auto_for(sorted_df.schema, block_rows=1000)
    df = encode_table(sorted_df, man).cache()
    yield df
    df.unpersist()


def test_zone_stats_recorded(blocks):
    r = blocks.select(F.explode("cols").alias("c")).select(
        "c.name", "c.vmin_i", "c.vmax_i", "c.vmin_d", "c.vmax_d"
    ).collect()
    ids = [x for x in r if x["name"] == "id"]
    prices = [x for x in r if x["name"] == "price"]
    assert len(ids) == 10 and len(prices) == 10
    assert all(x["vmin_i"] is not None and x["vmin_d"] is None for x in ids)
    assert all(x["vmin_d"] is not None and x["vmin_i"] is None for x in prices)
    assert min(x["vmin_i"] for x in ids) == 0
    assert max(x["vmax_i"] for x in ids) == 9999


def test_int_zone_pruning_correct_and_effective(blocks, sorted_df):
    pruned = prune_blocks(blocks, "id", 2500, 3499)
    assert pruned.count() == 2  # blocks [2000,2999] and [3000,3999] of 10
    dec = decode_table(blocks, "id bigint, price double", zone_filter=("id", 2500, 3499))
    got = dec.filter("id between 2500 and 3499")  # row-level filter on the superset
    want = sorted_df.filter("id between 2500 and 3499")
    assert sorted(map(str, got.collect())) == sorted(map(str, want.collect()))


def test_float_zone_pruning(blocks):
    pruned = prune_blocks(blocks, "price", 10.0, 19.99)
    assert pruned.count() == 1  # prices 10.00-19.99 live in block [1000,1999]


def test_nan_blocks_prune_safely(spark):
    """NaN never satisfies a range predicate, so stats that skip NaN are
    still conservative: pruning the block on a non-overlapping range loses
    no matching rows; an ALL-NaN block has no stats and is always kept."""
    pdf = pd.DataFrame({"v": [1.0, float("nan"), 2.0]})
    df = spark.createDataFrame(pdf).coalesce(1)  # one block
    blocks = encode_table(df, CodecManifest.auto_for(df.schema))
    assert prune_blocks(blocks, "v", 1.5, 200.0).count() == 1  # overlaps -> kept
    assert prune_blocks(blocks, "v", 100.0, 200.0).count() == 0  # NaN can't match
    all_nan = spark.createDataFrame(pd.DataFrame({"v": [float("nan")] * 3})).coalesce(1)
    bl2 = encode_table(all_nan, CodecManifest.auto_for(all_nan.schema))
    assert prune_blocks(bl2, "v", 100.0, 200.0).count() == bl2.count()  # kept


def test_wide_zone_filter_pushes_to_parquet(spark, sorted_df, tmp_path):
    man = CodecManifest.auto_for(sorted_df.schema, block_rows=1000)
    path = str(tmp_path / "wideblocks")
    encode_table(sorted_df, man, layout="wide").write.parquet(path)
    stored = spark.read.parquet(path)
    dec = decode_table(stored, "id bigint", zone_filter=("id", 0, 999))
    rows = dec.filter("id < 1000").count()
    assert rows == 1000
    plan = dec._jdf.queryExecution().executedPlan().toString()
    # the zone predicate must reach the parquet scan (row-group pruning)
    assert "PushedFilters" in plan
    assert "c_id__vmax_i" in plan.split("PushedFilters")[1][:300]


def test_presort_amplifies_rle(spark):
    """SIGMOD 2020 permutation effect: interleaved low-card values become
    long runs after an in-task presort — measured, not assumed."""
    import pandas as pd

    from xml2arrow_spark.operators.encode import encode_table as enc

    pdf = pd.DataFrame(
        {"id": range(20_000), "tag": [i % 4 for i in range(20_000)]}
    )
    df = spark.createDataFrame(pdf).coalesce(1)
    man = CodecManifest(columns={"tag": ColumnPolicy()}, block_rows=20_000)

    def tag_bytes(blocks):
        r = blocks.select(F.explode("cols").alias("c")).select("c.codec", "c.out_bytes").collect()
        return r[0]["codec"], r[0]["out_bytes"]

    codec_plain, plain_bytes = tag_bytes(enc(df, man))
    codec_sorted, sorted_bytes = tag_bytes(enc(df, man, presort=["tag"]))
    assert codec_sorted == "rle"  # 4 runs after the permutation
    # >15x smaller: the sorted block is a ~30-byte payload plus the fixed
    # ~250-byte JSON header (incl. the r05 crc), so the ratio here is
    # header-bound; at real block sizes the payload ratio is ~500x
    assert sorted_bytes * 15 < plain_bytes
    # decoded multiset unchanged (order is per the presort, values intact)
    dec = decode_table(enc(df, man, presort=["tag"]), "tag bigint")
    assert dec.groupBy("tag").count().orderBy("tag").collect() == (
        df.groupBy("tag").count().orderBy("tag").collect()
    )


def test_zone_maps_toggle_off(spark, sorted_df):
    """manifest.zone_maps=False skips the stats passes (trusted-throughput
    toggle, ~8% measured on the token hot path); blocks carry no stats and
    are never pruned."""
    man = CodecManifest.auto_for(sorted_df.schema, block_rows=1000)
    man.zone_maps = False
    blocks = encode_table(sorted_df, man)
    r = blocks.select(F.explode("cols").alias("c")).select("c.vmin_i", "c.vmin_d").collect()
    assert all(x["vmin_i"] is None and x["vmin_d"] is None for x in r)
    assert prune_blocks(blocks, "id", 0, 1).count() == blocks.count()
    # yaml round trip preserves the knob
    assert CodecManifest.from_yaml(man.to_yaml()).zone_maps is False


def test_prune_blocks_any_disjunctive_point_sets(spark):
    """OR-of-points zone pruning (the lookup shape): on id-presorted blocks
    the survivors are exactly the blocks whose range contains a requested
    id (a strict subset here); result rows are a superset of the matches;
    missing stats keep the block (conservative)."""
    from pyspark.sql import functions as F

    from xml2arrow_spark.manifest import CodecManifest
    from xml2arrow_spark.operators.encode import (
        decode_table,
        encode_table,
        prune_blocks_any,
    )
    from xml2arrow_spark.sources import tokens_dataframe

    df = tokens_dataframe(spark, 2000, variant="low_card", n_partitions=1)
    man = CodecManifest.auto_for(df.schema, block_rows=128)
    blocks = encode_table(df, man, presort=["doc_id"]).cache()
    n_blocks = blocks.count()

    wanted = [r["doc_id"] for r in df.select("doc_id").limit(5).collect()]
    kept = prune_blocks_any(blocks, "doc_id", wanted).cache()
    assert 0 < kept.count() < n_blocks  # presort => tight ranges => pruning

    got = decode_table(kept, "doc_id string, n_tok int").filter(
        F.col("doc_id").isin(wanted)
    )
    assert got.count() == 5  # superset decode + exact row filter = all hits

    # hash-scrambled row order (each block's id range spans ~everything):
    # pruning may keep every block, but must never lose a hit
    blocks2 = encode_table(df.orderBy(F.xxhash64("doc_id")), man).cache()
    kept2 = prune_blocks_any(blocks2, "doc_id", wanted)
    got2 = decode_table(kept2, "doc_id string, n_tok int").filter(
        F.col("doc_id").isin(wanted)
    )
    assert got2.count() == 5
    # empty value list is a no-op passthrough
    assert prune_blocks_any(blocks2, "doc_id", []).count() == blocks2.count()
    blocks.unpersist()
    blocks2.unpersist()
