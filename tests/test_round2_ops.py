"""Round-2 operator coverage: exact unit placement, near-dup resolution,
two-phase signature table, banded LSH occupancy, multi-table fan-out,
vectorized multimodal stats, nullable-int codec selection."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from xml2arrow_spark.operators.checkpoint import plan_units
from xml2arrow_spark.operators.fanout import fan_out
from xml2arrow_spark.pipeline import dedup, multimodal, similarity
from xml2arrow_spark.pipeline import sqlgen as G


# -- exact unit placement (VERDICT r01 "What's wrong" #2) --------------------


def test_units_land_in_distinct_nonempty_partitions(spark):
    """plan_units + repartition(n_units, id_col) places unit p EXACTLY in
    partition p: no re-hash collisions, no empty partitions (while all
    units are present), no split units."""
    n_units = 8
    df = spark.range(0, 4000).select(F.concat(F.lit("doc"), "id").alias("doc_id"))
    units = plan_units(df, n_units, "doc_id").repartition(n_units, "doc_id")
    placed = (
        units.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            F.countDistinct("unit_id").alias("n_units"),
            F.min("unit_id").alias("unit"),
            F.count("*").alias("rows"),
        )
        .collect()
    )
    assert len(placed) == n_units  # every partition non-empty
    for r in placed:
        assert r["n_units"] == 1  # exactly one unit per partition
        assert r["unit"] == r["pid"]  # and it is THE matching unit
        assert r["rows"] > 0


def test_unit_assignment_is_data_deterministic(spark):
    """Same ids -> same units regardless of physical layout (resume rests
    on this)."""
    a = plan_units(
        spark.range(0, 1000, numPartitions=1).selectExpr("cast(id as string) doc_id"), 16
    )
    b = plan_units(
        spark.range(0, 1000, numPartitions=7).selectExpr("cast(id as string) doc_id"), 16
    )
    da = {r["doc_id"]: r["unit_id"] for r in a.collect()}
    db = {r["doc_id"]: r["unit_id"] for r in b.collect()}
    assert da == db


# -- near-dup resolution (pairs -> connected components) ---------------------


def test_resolve_near_dups_components(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (9, 3)], "doc_a bigint, doc_b bigint"
    )
    labels = {
        r["node"]: r["label"] for r in dedup.resolve_near_dups(pairs).collect()
    }
    assert labels == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5}


def test_resolve_near_dups_long_chain(spark):
    # a 12-node path graph needs several propagation rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "doc_a bigint, doc_b bigint"
    )
    labels = {r["node"]: r["label"] for r in dedup.resolve_near_dups(pairs).collect()}
    assert set(labels.values()) == {0}
    assert len(labels) == 12


def test_resolve_converges_logarithmically(spark):
    """Pointer jumping: an 80-node path must resolve within ~log2(80)+slack
    rounds — plain 1-hop propagation would need ~80 and fail this cap.
    (local_threshold=0 forces the DISTRIBUTED loop: the r06 small-input
    short-circuit would otherwise make this pin vacuous.)"""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(79)], "doc_a bigint, doc_b bigint"
    )
    labels = {
        r["node"]: r["label"]
        for r in dedup.resolve_near_dups(
            pairs, max_iters=10, local_threshold=0
        ).collect()
    }
    assert set(labels.values()) == {0}
    assert len(labels) == 80


def test_resolve_local_matches_distributed(spark):
    """The r06 driver-local union-find short-circuit is an exact twin of
    the distributed min-label loop: same labels on a random multi-component
    graph (int ids) and on string ids, same schema either way."""
    import random

    rng = random.Random(11)
    pairs_rows = [
        (rng.randrange(0, 60), rng.randrange(0, 60)) for _ in range(90)
    ]
    pairs = spark.createDataFrame(pairs_rows, "doc_a bigint, doc_b bigint")
    local = dedup.resolve_near_dups(pairs)
    dist = dedup.resolve_near_dups(pairs, local_threshold=0)
    assert local.schema == dist.schema
    assert sorted(map(tuple, local.collect())) == sorted(
        map(tuple, dist.collect())
    )
    spairs = spark.createDataFrame(
        [(f"d{a:03d}", f"d{b:03d}") for a, b in pairs_rows],
        "doc_a string, doc_b string",
    )
    slocal = dedup.resolve_near_dups(spairs)
    sdist = dedup.resolve_near_dups(spairs, local_threshold=0)
    assert slocal.schema == sdist.schema
    assert sorted(map(tuple, slocal.collect())) == sorted(
        map(tuple, sdist.collect())
    )
    # empty pair set: both paths return an empty (node, label) relation
    empty = spark.createDataFrame([], "doc_a bigint, doc_b bigint")
    assert dedup.resolve_near_dups(empty).count() == 0
    assert dedup.resolve_near_dups(empty, local_threshold=0).count() == 0


# -- two-phase signature table ----------------------------------------------


def _doc_df(spark, texts):
    return spark.createDataFrame(
        [(i, t, f"s{i % 2}", len(t)) for i, t in enumerate(texts)],
        "doc_id bigint, text string, source string, n_chars int",
    )


def test_two_phase_sig_table_matches_persist(spark, tmp_path):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "completely different words in this one here now",
        "the quick brown fox jumps over the lazy dog",
    ]
    docs = _doc_df(spark, texts)
    cached = dedup.lsh_near_dup_pairs(docs)
    res_persist = sorted(map(str, cached.collect()))
    if cached._sig_cache is not None:
        cached._sig_cache.unpersist()
    two_phase = dedup.lsh_near_dup_pairs(docs, sig_path=str(tmp_path / "sigs"))
    res_2p = sorted(map(str, two_phase.collect()))
    assert res_persist == res_2p
    # plan pin: the large-input path must contain NO InMemoryRelation
    plan = two_phase._jdf.queryExecution().optimizedPlan().toString()
    assert "InMemoryRelation" not in plan


# -- banded LSH: bounded cell occupancy at two corpus sizes ------------------


def _rand_emb(spark, n, dim=16, seed=7):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [[float(x) for x in v] for v in vecs],
        }
    )
    return spark.createDataFrame(pdf, "vec_id bigint, embedding array<float>")


@pytest.mark.parametrize("n", [512, 8192, 65536])
def test_band_cell_occupancy_bounded(spark, n):
    """rows-per-band scales with N (lsh_planes_for), so the mean band-cell
    size stays ~LSH_TARGET_CELL at any corpus size — the O((N/const)²)
    verify blowup of a fixed geometry cannot happen."""
    emb = _rand_emb(spark, n)
    rows = G.lsh_planes_for(n)
    assert 2**rows >= n / (2 * G.LSH_TARGET_CELL)  # geometry scales with N
    banded = similarity.with_lsh_bands(emb, dim=16, expected_n=n)
    occ = (
        banded.groupBy("bandkey0").count().agg(
            F.mean("count").alias("mean"), F.max("count").alias("max")
        )
    ).collect()[0]
    # mean occupancy tracks the target; max is loose (integer hyperplanes
    # are not perfectly balanced) but must stay O(target), not O(N)
    assert occ["mean"] <= 4 * G.LSH_TARGET_CELL
    assert occ["max"] <= n / 2


def test_banded_recall_identical_vectors(spark):
    emb = _rand_emb(spark, 64)
    # duplicate vec 0 as vec 999
    dup = emb.filter("vec_id = 0").withColumn("vec_id", F.lit(999).cast("bigint"))
    pairs = similarity.embedding_near_dup(emb.unionAll(dup), threshold=0.99)
    got = {(r["vec_a"], r["vec_b"]) for r in pairs.collect()}
    assert (0, 999) in got
    if pairs._sig_cache is not None:
        pairs._sig_cache.unpersist()


# -- multi-table fan-out -----------------------------------------------------


def test_fan_out_ordered_map_excludes_structural(spark):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "id bigint, name string, v bigint"
    )
    out = fan_out(
        df,
        {
            "dim": ["id", "name"],
            "hierarchy": [],  # structural only -> excluded (xml_parser.rs:700-704)
            "facts": lambda d: d.select("id", (F.col("v") * 2).alias("v2")),
        },
    )
    assert list(out) == ["dim", "facts"]  # insertion-ordered, like IndexMap
    assert out["dim"].columns == ["id", "name"]
    assert {r["v2"] for r in out["facts"].collect()} == {20, 40}
    out["dim"]._fanout_cache.unpersist()


# -- multimodal vectorized stats --------------------------------------------


def test_batch_stats_match_per_row_reference():
    payloads = pd.Series(
        [b"hello world", b"", b"x", bytes(range(256)), b"abc" * 100]
    )
    offs, buf, lens, byte_sum, head_hash = multimodal._batch_stats(payloads)
    for i, p in enumerate(payloads):
        assert lens[i] == len(p)
        assert byte_sum[i] == sum(p)
        expected = sum(b * 31**j for j, b in enumerate(p[:8])) % multimodal.HEAD_MOD
        assert head_hash[i] == expected


def test_fake_decoder_integer_exact_spec():
    buf = np.frombuffer(b"hello world", dtype=np.uint8)
    f = multimodal.fake_decoder(buf)
    n, s = 11, sum(b"hello world")
    first, last = buf[0], buf[-1]
    stride = max(n // 4, 1)
    assert list(f) == [
        float(n % 251),
        float(s % 997),
        float(buf.min()),
        float(buf.max()),
        float(first),
        float(last),
        float((first * 31 + last) % 509),
        float(int(buf[::stride].astype(np.int64).sum()) % 997),
    ]
    assert list(multimodal.fake_decoder(np.zeros(0, dtype=np.uint8))) == [0.0] * 8


# -- nullable-int codec selection (ADVICE r01 high) --------------------------


def test_resolve_manifest_nullable_int(spark):
    """pandas represents int+nulls as float64; resolve_manifest must still
    pick an integer codec instead of crashing (UFuncTypeError repro)."""
    from xml2arrow_spark.manifest import CodecManifest
    from xml2arrow_spark.plans.selector import resolve_manifest

    df = spark.createDataFrame(
        [(i, i % 100 if i % 7 else None) for i in range(2000)],
        "id bigint, v bigint",
    )
    man = resolve_manifest(df, CodecManifest.auto_for(df.schema))
    assert man.columns["v"].codec in {"plain", "for", "bitpack", "rle", "dict", "pdict"}
    # and the chosen codec round-trips the nullable column bit-identically
    from xml2arrow_spark.operators.encode import decode_table, encode_table

    decoded = decode_table(encode_table(df, man), "id bigint, v bigint")
    assert sorted(map(str, decoded.collect())) == sorted(map(str, df.collect()))
