"""Per-block Bloom index — point-lookup pruning on UNCLUSTERED datasets.

Zone maps can only prune id lookups when the dataset was presorted by id;
the Bloom index must prune (and never drop) on hash-placed, unsorted data,
survive mutations via invalidate-then-rebuild, and degrade to a no-op when
absent. Contract mirror of the reference's round-trip equality discipline
(/root/reference/tests/integration_tests.rs): every pruned read equals the
semi-joined truth."""

import os

from pyspark.sql import functions as F

from xml2arrow_spark.manifest import CodecManifest
from xml2arrow_spark.operators import bloomidx
from xml2arrow_spark.operators.bloomidx import (
    bloom_survivors,
    build_block_bloom,
    build_bloom_index,
    _hash_pair,
    _probe_block,
)
from xml2arrow_spark.operators.checkpoint import (
    encode_dataset,
    lookup_rows,
    upsert_rows,
)
from xml2arrow_spark.operators.verify import verify_roundtrip
from xml2arrow_spark.sources import tokens_dataframe


def _ids_df(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id string")


def test_block_bloom_no_false_negatives_and_low_fpr():
    members = [f"doc-{i:05d}" for i in range(1000)]
    m, bits = build_block_bloom(members, bits_per_row=10, k=7)
    assert m >= 10 * 1000 and m % 64 == 0
    # Bloom guarantee: every member probes positive
    for v in members[::37]:
        assert _probe_block(bits, m, [_hash_pair(v)], 7)
    # non-members: <3% false positives at 10 bits/row, k=7 (theory ~0.8%)
    others = [f"ghost-{i:05d}" for i in range(2000)]
    fp = sum(_probe_block(bits, m, [_hash_pair(v)], 7) for v in others)
    assert fp / len(others) < 0.03
    # null values are skipped, not hashed
    m2, bits2 = build_block_bloom(["a", None, "b"], bits_per_row=10, k=7)
    assert _probe_block(bits2, m2, [_hash_pair("a")], 7)


def test_bloom_local_build_matches_spark(spark, tmp_path):
    """The r06 driver-local index build writes the SAME filter table the
    Spark job writes — every (unit_id, block_id, m_bits, bits) row
    identical, full rebuild and partial unit refresh alike."""
    path = str(tmp_path / "bleq")
    df = tokens_dataframe(spark, 2000, variant="low_card", n_partitions=4)
    man = CodecManifest.auto_for(df.schema, block_rows=128)
    encode_dataset(df, path, man, n_units=4)

    def rows():
        return sorted(
            map(
                tuple,
                spark.read.parquet(
                    os.path.join(path, "bloomidx", "doc_id", "blocks")
                ).collect(),
            )
        )

    build_bloom_index(spark, path, "doc_id")  # local path (small blocks)
    local_rows = rows()
    build_bloom_index(spark, path, "doc_id", local_threshold_bytes=0)
    assert rows() == local_rows and len(local_rows) > 0
    # partial refresh of two units through the local path
    build_bloom_index(spark, path, "doc_id", units=[0, 2])
    assert rows() == local_rows


def test_bloom_index_prunes_unclustered_lookup(spark, tmp_path):
    """The headline case: NO presort, so zone maps keep everything — the
    Bloom index must cut the decoded blocks to ~the probed ids' own blocks
    while the result stays equal to the semi-joined truth."""
    path = str(tmp_path / "bl1")
    df = tokens_dataframe(spark, 3000, variant="low_card", n_partitions=4).cache()
    man = CodecManifest.auto_for(df.schema, block_rows=128)
    encode_dataset(df, path, man, n_units=4)  # deliberately unclustered

    blocks = spark.read.parquet(os.path.join(path, "blocks"))
    n_blocks = blocks.count()
    res = build_bloom_index(spark, path, "doc_id")
    assert res["blocks_indexed"] == n_blocks
    assert "doc_id" in bloomidx.list_indexes(path)

    wanted = [r["doc_id"] for r in df.select("doc_id").limit(6).collect()]
    units = sorted(
        r["unit_id"]
        for r in spark.createDataFrame([(i,) for i in wanted], "doc_id string")
        .withColumn("unit_id", F.pmod(F.hash("doc_id"), F.lit(4)).cast("int"))
        .select("unit_id")
        .distinct()
        .collect()
    )
    unprunable, survivors = bloom_survivors(path, "doc_id", wanted, units)
    assert not unprunable  # full build: every affected unit is indexed
    kept = sum(len(v) for v in survivors.values())
    in_units = blocks.filter(F.col("unit_id").isin(units)).count()
    assert 0 < kept < in_units  # strictly prunes within the affected units

    got = lookup_rows(_ids_df(spark, wanted), path)
    expect = df.join(_ids_df(spark, wanted), "doc_id", "left_semi")
    assert verify_roundtrip(expect, got)["ok"]

    # an id provably absent everywhere: zero surviving blocks, zero rows
    _, ghost = bloom_survivors(path, "doc_id", ["no-such-doc"], units)
    assert sum(len(v) for v in ghost.values()) <= 1  # ≤ false positives
    assert lookup_rows(_ids_df(spark, ["no-such-doc"]), path).count() == 0
    df.unpersist()


def test_bloom_index_mutation_invalidate_then_rebuild(spark, tmp_path):
    """Upsert must (a) never serve stale filters — a NEW id inserted into a
    rewritten unit is found immediately — and (b) leave the index rebuilt,
    still pruning. The crash window (invalidated, not yet rebuilt) is
    simulated explicitly and must be conservative, not wrong."""
    path = str(tmp_path / "bl2")
    df = tokens_dataframe(spark, 2000, variant="low_card", n_partitions=4).cache()
    man = CodecManifest.auto_for(df.schema, block_rows=128)
    encode_dataset(df, path, man, n_units=4)
    build_bloom_index(spark, path, "doc_id")

    new_id = "brand-new-doc-1"
    batch = (
        df.limit(1)
        .withColumn("doc_id", F.lit(new_id))
        .withColumn("source", F.lit("upsert"))
    )
    upsert_rows(batch, path)

    # (a) fresh: the new id is served through the bloom-pruned path
    got = lookup_rows(_ids_df(spark, [new_id]), path)
    assert got.count() == 1

    # (b) rebuilt: its unit is indexed again and prunes
    unit = (
        spark.createDataFrame([(new_id,)], "doc_id string")
        .withColumn("u", F.pmod(F.hash("doc_id"), F.lit(4)).cast("int"))
        .collect()[0]["u"]
    )
    unprunable, survivors = bloom_survivors(path, "doc_id", [new_id], [unit])
    assert not unprunable and sum(len(v) for v in survivors.values()) >= 1

    # (c) crash window: invalidated but not rebuilt -> conservative keep-all
    bloomidx.invalidate_units(path, [unit])
    unprunable2, _ = bloom_survivors(path, "doc_id", [new_id], [unit])
    assert unit in unprunable2
    assert lookup_rows(_ids_df(spark, [new_id]), path).count() == 1
    df.unpersist()


def test_bloom_absent_index_is_a_noop(spark, tmp_path):
    path = str(tmp_path / "bl3")
    df = tokens_dataframe(spark, 500, variant="low_card", n_partitions=2).cache()
    man = CodecManifest.auto_for(df.schema, block_rows=128)
    encode_dataset(df, path, man, n_units=2)
    assert bloomidx.list_indexes(path) == {}
    assert bloomidx.bloom_filter_expr(path, "doc_id", ["x"], [0, 1]) is None
    wanted = [r["doc_id"] for r in df.select("doc_id").limit(3).collect()]
    got = lookup_rows(_ids_df(spark, wanted), path)
    expect = df.join(_ids_df(spark, wanted), "doc_id", "left_semi")
    assert verify_roundtrip(expect, got)["ok"]
    df.unpersist()


def test_bloom_index_extends_on_resume(spark, tmp_path):
    """A dataset indexed while partially encoded must come out FULLY
    indexed once resumes complete it (encode_dataset refreshes existing
    indexes for the units it just encoded)."""
    path = str(tmp_path / "bl5")
    df = tokens_dataframe(spark, 2000, variant="low_card", n_partitions=4).cache()
    man = CodecManifest.auto_for(df.schema, block_rows=128)
    encode_dataset(df, path, man, n_units=4, only_units=[0, 1])
    build_bloom_index(spark, path, "doc_id")
    encode_dataset(df, path, man, n_units=4)  # resume: units 2, 3
    unprunable, survivors = bloom_survivors(
        path, "doc_id", [r["doc_id"] for r in df.select("doc_id").limit(4).collect()],
        [0, 1, 2, 3],
    )
    assert not unprunable and set(survivors) == {0, 1, 2, 3}
    blocks_total = spark.read.parquet(os.path.join(path, "blocks")).count()
    import pyarrow.parquet as pq

    idx_total = pq.read_table(
        os.path.join(path, "bloomidx", "doc_id", "blocks"), columns=["block_id"]
    ).num_rows
    assert idx_total == blocks_total
    df.unpersist()


def test_audit_index_flags_restored_stale_index(spark, tmp_path):
    """An index restored from before a mutation (the skipped-invalidation /
    operator-error scenario) must be FLAGGED: here the delete shrinks the
    units' block counts, so the stale key sets differ and the metadata
    level catches it; a rebuild restores green. Unindexed units are
    reported but never fail (missing-is-conservative)."""
    import shutil

    from xml2arrow_spark.operators.bloomidx import audit_index
    from xml2arrow_spark.operators.checkpoint import audit_dataset, delete_rows

    path = str(tmp_path / "ba1")
    df = tokens_dataframe(spark, 2000, variant="low_card", n_partitions=4).cache()
    man = CodecManifest.auto_for(df.schema, block_rows=128)
    encode_dataset(df, path, man, n_units=4)
    build_bloom_index(spark, path, "doc_id")
    rep = audit_dataset(spark, path)
    assert rep["base:bloom:doc_id"]["ok"]
    assert rep["base:bloom:doc_id"]["unindexed_units"] == []

    idxdir = os.path.join(path, "bloomidx", "doc_id", "blocks")
    snap = str(tmp_path / "idx_snap")
    shutil.copytree(idxdir, snap)
    # halve every unit -> fewer blocks per unit
    delete_rows(
        df.filter("doc_id LIKE '%0' OR doc_id LIKE '%2' OR doc_id LIKE '%4' "
                  "OR doc_id LIKE '%6' OR doc_id LIKE '%8'").select("doc_id"),
        path,
    )
    assert audit_index(spark, path, "doc_id")["ok"]  # rebuilt by the mutation
    shutil.rmtree(idxdir)
    shutil.copytree(snap, idxdir)
    spark.catalog.refreshByPath(idxdir)  # restored files: drop cached listing
    stale = audit_index(spark, path, "doc_id")
    assert stale["stale_units"] and not stale["ok"]
    build_bloom_index(spark, path, "doc_id")
    assert audit_index(spark, path, "doc_id", deep=True)["ok"]
    df.unpersist()


def test_audit_index_deep_catches_same_keys_different_values(spark, tmp_path):
    """The case metadata CANNOT see: swap one id for a new id in the same
    unit (row count, block count, and deterministic block ids all
    unchanged), restore the pre-swap index — key sets match, but the
    stored bits answer for the WRONG id set. Only the deep recompute
    flags it."""
    import shutil

    from xml2arrow_spark.operators.bloomidx import audit_index
    from xml2arrow_spark.operators.checkpoint import delete_rows, upsert_rows

    path = str(tmp_path / "ba2")
    df = tokens_dataframe(spark, 2000, variant="low_card", n_partitions=4).cache()
    man = CodecManifest.auto_for(df.schema, block_rows=128)
    encode_dataset(df, path, man, n_units=4)
    build_bloom_index(spark, path, "doc_id")
    idxdir = os.path.join(path, "bloomidx", "doc_id", "blocks")
    snap = str(tmp_path / "idx_snap2")
    shutil.copytree(idxdir, snap)

    some = df.select("doc_id").limit(1).collect()[0]["doc_id"]
    unit = (
        spark.createDataFrame([(some,)], "doc_id string")
        .select(F.pmod(F.hash("doc_id"), F.lit(4)).cast("int").alias("u"))
        .collect()[0]["u"]
    )
    cand = (
        spark.createDataFrame([(f"repl-{i}",) for i in range(64)], "doc_id string")
        .withColumn("u", F.pmod(F.hash("doc_id"), F.lit(4)).cast("int"))
        .filter(F.col("u") == unit)
        .limit(1)
        .collect()[0]["doc_id"]
    )
    delete_rows(spark.createDataFrame([(some,)], "doc_id string"), path)
    upsert_rows(df.filter(F.col("doc_id") == some).withColumn("doc_id", F.lit(cand)), path)
    assert audit_index(spark, path, "doc_id", deep=True)["ok"]  # honest rebuild

    shutil.rmtree(idxdir)
    shutil.copytree(snap, idxdir)
    spark.catalog.refreshByPath(idxdir)
    shallow = audit_index(spark, path, "doc_id", deep=False)
    assert shallow["stale_units"] == []  # identical keys: metadata is blind
    deep = audit_index(spark, path, "doc_id", deep=True)
    assert unit in deep["deep_mismatched_units"] and not deep["ok"]
    df.unpersist()


def test_bloom_partial_refresh_reuses_recorded_geometry(spark, tmp_path):
    """A units= refresh must reuse the sidecar's bits_per_row/k even when
    the caller passes different values — mixed geometry across partitions
    would make driver probes nonsense."""
    import yaml

    path = str(tmp_path / "bl4")
    df = tokens_dataframe(spark, 1000, variant="low_card", n_partitions=2).cache()
    man = CodecManifest.auto_for(df.schema, block_rows=128)
    encode_dataset(df, path, man, n_units=2)
    build_bloom_index(spark, path, "doc_id", bits_per_row=12, k=5)
    build_bloom_index(spark, path, "doc_id", bits_per_row=99, k=1, units=[0])
    with open(os.path.join(path, "bloomidx", "doc_id", "_bloom.yaml")) as f:
        side = yaml.safe_load(f.read())
    assert side["bits_per_row"] == 12 and side["k"] == 5
    wanted = [r["doc_id"] for r in df.select("doc_id").limit(4).collect()]
    got = lookup_rows(_ids_df(spark, wanted), path)
    expect = df.join(_ids_df(spark, wanted), "doc_id", "left_semi")
    assert verify_roundtrip(expect, got)["ok"]
    df.unpersist()


# -- pure-kernel property tests (no Spark session) ---------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_values = st.lists(
    st.one_of(
        st.text(max_size=40),
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        st.none(),
    ),
    min_size=0,
    max_size=300,
)


@settings(max_examples=150, deadline=None)
@given(_values, st.integers(min_value=2, max_value=16), st.integers(min_value=1, max_value=12))
def test_bloom_property_never_false_negative(vals, bits_per_row, k):
    """The Bloom guarantee under ANY value mix, geometry, and unicode: every
    non-null member probes positive; geometry invariants hold."""
    m, bits = build_block_bloom(vals, bits_per_row, k)
    assert m % 64 == 0 and len(bits) == m // 8
    for v in vals:
        if v is not None:
            assert _probe_block(bits, m, [_hash_pair(v)], k)


@settings(max_examples=80, deadline=None)
@given(st.lists(st.text(min_size=1, max_size=20), min_size=1, max_size=100, unique=True))
def test_bloom_property_empty_filter_rejects(vals):
    """A filter built over an empty block rejects everything (no bits set)."""
    m, bits = build_block_bloom([], bits_per_row=10, k=7)
    assert not _probe_block(bits, m, [_hash_pair(v) for v in vals], 7)
