"""Round-5 operators: reliable (cluster-survivable) connected-components
checkpointing, registry-consolidation composites, and the sampled IVF
training path (VERDICT r04 items 1-3)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from xml2arrow_spark.pipeline import dedup


def _chain_pairs(spark, n=40):
    # a path graph 0-1-2-...-n: worst case for label propagation (deep
    # diameter), so convergence genuinely takes several rounds
    rows = [(i, i + 1) for i in range(n)]
    return spark.createDataFrame(rows, "doc_a bigint, doc_b bigint")


def _labels(df) -> dict[int, int]:
    return {r["node"]: r["label"] for r in df.collect()}


def test_reliable_checkpoint_matches_local(spark, tmp_path):
    pairs = _chain_pairs(spark)
    want = _labels(dedup.resolve_near_dups(pairs))
    got = _labels(
        dedup.resolve_near_dups(pairs, checkpoint_dir=str(tmp_path / "cc"))
    )
    assert got == want
    assert set(want.values()) == {0}  # one component, min-label = 0


def test_reliable_checkpoint_resumes_from_killed_round(spark, tmp_path):
    """A run killed mid-iteration restarts from the last committed round:
    the marker + parquet labels are reliable storage, so the resumed run
    converges to the same fixpoint WITHOUT redoing completed rounds."""
    pairs = _chain_pairs(spark)
    want = _labels(dedup.resolve_near_dups(pairs))
    cc = str(tmp_path / "cc")

    # simulate the kill: only round 0 completes before the job dies
    partial = dedup.resolve_near_dups(pairs, max_iters=1, checkpoint_dir=cc)
    assert _labels(partial) != want  # genuinely unconverged at the kill
    state0 = json.load(open(os.path.join(cc, "STATE.json")))
    assert state0["round"] == 0

    # restart with the same directory: resumes at round 1 (the marker), not 0
    resumed = dedup.resolve_near_dups(pairs, checkpoint_dir=cc)
    assert _labels(resumed) == want
    state1 = json.load(open(os.path.join(cc, "STATE.json")))
    assert state1["round"] > 0

    # storage stays O(2 rounds): stale label dirs are pruned as rounds advance
    label_dirs = [d for d in os.listdir(cc) if d.startswith("labels_")]
    assert len(label_dirs) <= 3


def test_reliable_checkpoint_resume_after_convergence_is_stable(spark, tmp_path):
    """Re-invoking on a CONVERGED directory is idempotent: the completed
    run's state is rebuilt from the input, same labels."""
    pairs = _chain_pairs(spark, n=8)
    cc = str(tmp_path / "cc")
    first = _labels(dedup.resolve_near_dups(pairs, checkpoint_dir=cc))
    again = _labels(dedup.resolve_near_dups(pairs, checkpoint_dir=cc))
    assert first == again


def test_completed_checkpoint_dir_never_replays_stale_labels(spark, tmp_path):
    """r05 review finding: a stable checkpoint dir reused across corpus
    versions must RESOLVE THE NEW INPUT, not resume the finished run's
    labels — resume semantics apply to killed (unconverged) runs only."""
    cc = str(tmp_path / "cc")
    a = spark.createDataFrame([(1, 2), (2, 3)], "doc_a bigint, doc_b bigint")
    got_a = _labels(dedup.resolve_near_dups(a, checkpoint_dir=cc))
    assert set(got_a) == {1, 2, 3}
    # corpus B: disjoint node set through the SAME directory
    b = spark.createDataFrame(
        [(10, 11), (11, 12), (12, 13)], "doc_a bigint, doc_b bigint"
    )
    got_b = _labels(dedup.resolve_near_dups(b, checkpoint_dir=cc))
    assert set(got_b) == {10, 11, 12, 13}  # B's nodes, not A's replay
    assert set(got_b.values()) == {10}


def test_killed_checkpoint_dir_with_new_input_rebuilds(spark, tmp_path):
    """Second review finding: a KILLED (unconverged) marker must not make
    a later call with a DIFFERENT corpus resume the old run either — the
    input fingerprint in the marker gates every resume."""
    cc = str(tmp_path / "cc")
    a = _chain_pairs(spark, n=12)
    dedup.resolve_near_dups(a, max_iters=1, checkpoint_dir=cc)  # killed on A
    b = spark.createDataFrame(
        [(20, 21), (21, 22)], "doc_a bigint, doc_b bigint"
    )
    got_b = _labels(dedup.resolve_near_dups(b, checkpoint_dir=cc))
    assert set(got_b) == {20, 21, 22}
    assert set(got_b.values()) == {20}


def test_resolve_string_ids(spark, tmp_path):
    """String doc ids (the tokenized table's type) resolve correctly: the
    numeric-sum convergence check is an ANSI cast ERROR on strings (r05
    finding), so non-numeric labels use the exact changed-count check —
    in both pinning modes."""
    pairs = spark.createDataFrame(
        [(f"d{i:02d}", f"d{i + 1:02d}") for i in range(9)],
        "doc_a string, doc_b string",
    )
    for kwargs in ({}, {"checkpoint_dir": str(tmp_path / "cc_str")}):
        labels = {
            r["node"]: r["label"]
            for r in dedup.resolve_near_dups(pairs, **kwargs).collect()
        }
        assert set(labels.values()) == {"d00"}
        assert len(labels) == 10


def test_ivf_sampled_training(spark, sf_dir):
    """VERDICT r04 #3: k-means iterates over the deterministic hash-bucket
    sample, not the corpus. train_milli=1000 (every bucket) must equal the
    full-corpus path exactly; the default 500-milli sample must genuinely
    restrict the training set (different codebook on this data)."""
    from xml2arrow_spark.pipeline import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    full = similarity.ivf_train(emb, train_milli=None)
    all_buckets = similarity.ivf_train(emb, train_milli=1000)
    assert all_buckets == full
    sampled = similarity.ivf_train(emb)  # default IVF_TRAIN_MILLI
    assert sampled != full
    # sampled codebooks are themselves deterministic (same sample rule)
    assert similarity.ivf_train(emb) == sampled


def test_selector_scale_invariant_choice(spark):
    """VERDICT r04 #8: the auto string-codec choice must not flip with
    corpus size. Digit-string id columns of 300 vs 6000 rows (the shape
    that flipped plain_str->fsst between sf0.01 and sf0.1 in r04) resolve
    to the SAME codec under canonical-block costing."""
    from xml2arrow_spark.manifest import CodecManifest
    from xml2arrow_spark.plans.selector import resolve_manifest

    def choice(n):
        df = spark.range(n).selectExpr("CAST(id AS STRING) AS doc_id")
        man = resolve_manifest(
            df, CodecManifest.auto_for(df.schema, block_rows=8192)
        )
        return man.columns["doc_id"].codec

    assert choice(300) == choice(6000)


def test_pii_scrub(spark):
    """Typed redaction + per-category counts; patterns must behave
    identically on Java and RE2 (no lookaround), order email->ip->phone."""
    from xml2arrow_spark.pipeline import textstats

    rows = [
        (1, "write a.b+c@ex.co.uk or x@y.io today"),
        (2, "call 555-123-4567 from 10.0.0.1 now"),
        (3, "no pii here at all"),
        (4, "ver 1.2.3 is not an ip; 12-34-5678 not a phone"),
    ]
    got = {
        r["doc_id"]: r
        for r in textstats.pii_scrub(
            spark.createDataFrame(rows, "doc_id bigint, text string")
        ).collect()
    }
    assert got[1]["scrubbed"] == "write <EMAIL> or <EMAIL> today"
    assert (got[1]["n_email"], got[1]["n_ipv4"], got[1]["n_phone"]) == (2, 0, 0)
    assert got[2]["scrubbed"] == "call <PHONE> from <IP> now"
    assert (got[2]["n_email"], got[2]["n_ipv4"], got[2]["n_phone"]) == (0, 1, 1)
    assert got[3]["scrubbed"] == rows[2][1]
    assert got[4]["scrubbed"] == rows[3][1]  # near-misses untouched


def test_paragraph_dedup(spark):
    """CCNet-style paragraph dedup: a boilerplate paragraph shared by more
    than max_df docs is dropped everywhere; unique content survives in
    original order (pinned via the cleaned-text fingerprint)."""
    from xml2arrow_spark.pipeline import textstats

    boiler = "click here now"
    rows = [(i, f"unique words {i} " + boiler) for i in range(5)]
    rows.append((99, "all original content here"))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r["doc_id"]: r
        for r in textstats.paragraph_dedup(
            docs, para_words=3, max_df=2
        ).collect()
    }
    # each 6-word doc = two 3-word paragraphs; the boilerplate tail is
    # shared by 5 > max_df docs and dropped, the unique head survives
    for i in range(5):
        assert (got[i]["n_paras"], got[i]["n_kept"]) == (2, 1)
        assert got[i]["clean_len"] == len(f"unique words {i}")
    assert (got[99]["n_paras"], got[99]["n_kept"]) == (2, 2)
    assert got[99]["clean_len"] == len(rows[-1][1])
    # cleaned-text fingerprint == doc_fingerprint of the kept text
    ref = spark.createDataFrame(
        [(0, "unique words 0")], "doc_id bigint, text string"
    )
    want = textstats.doc_fingerprint(ref).collect()[0]["fingerprint"]
    assert got[0]["clean_fp"] == want
    # a doc that is ENTIRELY boilerplate keeps nothing, null-free output
    allb = spark.createDataFrame(
        [(i, boiler) for i in range(4)], "doc_id bigint, text string"
    )
    out = textstats.paragraph_dedup(allb, para_words=3, max_df=2).collect()
    assert all((r["n_kept"], r["clean_len"]) == (0, 0) for r in out)
    assert all(r["clean_fp"] is not None for r in out)


def test_registry_fits_driver_window():
    """VERDICT r04 #1: the driver checks the first 50 registry entries;
    every operator must hold a slot inside that window."""
    import __spark_entry__ as entry

    qs = entry.queries()
    assert len(qs) <= 50
    assert set(entry.oracle_sql()) == set(qs)


# ---------------------------------------------------------------------------
# metadata-only aggregate pushdown (r05 continuation #3)


@pytest.mark.parametrize("layout", ["nested", "wide"])
def test_dataset_stats_aggregate_pushdown_exact(spark, tmp_path, layout):
    """n_rows / n_nonnull / sum_i rolled up from per-block stats must equal
    the recomputed truth — including a leading ALL-NULL block (whose sum
    contribution is the additive identity, not 'unstated') and a
    list<int> column whose sum is over flattened elements."""
    from xml2arrow_spark.manifest import CodecManifest
    from xml2arrow_spark.operators.dataset import (
        dataset_column_stats,
        encode_parquet_dataset,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / f"agg_{layout}")
    rows = [
        (i, None if i < 64 else i * 3, [i, i + 1, i + 2], float(i) / 7.0)
        for i in range(256)
    ]
    spark.createDataFrame(
        rows, "a bigint, c bigint, toks array<bigint>, f double"
    ).orderBy("a").coalesce(2).write.mode("overwrite").parquet(src)
    man = CodecManifest.auto_for(spark.read.parquet(src).schema, block_rows=64)
    encode_parquet_dataset(spark, src, out, manifest=man, layout=layout)
    stats = {r.column: r for r in dataset_column_stats(spark, out).collect()}

    assert stats["a"].n_rows == 256
    assert stats["a"].n_nonnull == 256
    assert stats["a"].sum_i == sum(range(256))
    assert stats["a"].n_sum_unstated == 0
    # nullable column: COUNT(col) semantics, sum over non-null only
    assert stats["c"].n_nonnull == 192
    assert stats["c"].sum_i == sum(i * 3 for i in range(64, 256))
    # list column: row-level null count, element-level sum
    assert stats["toks"].n_nonnull == 256
    assert stats["toks"].sum_i == sum(3 * i + 3 for i in range(256))
    # float column: no metadata sum, ever (roll-up cannot reproduce a
    # sequential fold) — but counts still push down
    assert stats["f"].sum_i is None
    assert stats["f"].n_sum_unstated == stats["f"].n_blocks
    assert stats["f"].n_nonnull == 256


def test_dataset_stats_sum_refuses_unprovable_overflow(spark, tmp_path):
    """A block whose sum is not PROVABLY exact in int64 stores no sum; the
    roll-up then refuses (NULL) rather than risking a wrapped value. One
    bad block voids the whole column — exactness is all-or-nothing."""
    from xml2arrow_spark.manifest import CodecManifest
    from xml2arrow_spark.operators.dataset import (
        dataset_column_stats,
        encode_parquet_dataset,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "ovf")
    big = 2**62
    rows = [(i, big if i % 2 else -big) for i in range(128)]
    spark.createDataFrame(rows, "a bigint, huge bigint").orderBy(
        "a"
    ).coalesce(1).write.mode("overwrite").parquet(src)
    man = CodecManifest.auto_for(spark.read.parquet(src).schema, block_rows=64)
    encode_parquet_dataset(spark, src, out, manifest=man)
    stats = {r.column: r for r in dataset_column_stats(spark, out).collect()}
    assert stats["huge"].sum_i is None
    assert stats["huge"].n_sum_unstated == stats["huge"].n_blocks
    assert stats["a"].sum_i == sum(range(128))  # small column unaffected


def test_dataset_stats_pre_stats_dataset_reports_unstated(spark, tmp_path):
    """A dataset written before the aggregate stats existed (simulated by
    stripping the stat columns) reports NULL aggregates — the guard reads
    'missing' as 'unstated', never fails and never fabricates."""
    import shutil

    from xml2arrow_spark.manifest import CodecManifest
    from xml2arrow_spark.operators.dataset import (
        dataset_column_stats,
        encode_parquet_dataset,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "new")
    old = str(tmp_path / "old")
    spark.createDataFrame(
        [(i, i * 2) for i in range(128)], "a bigint, b bigint"
    ).coalesce(1).write.mode("overwrite").parquet(src)
    man = CodecManifest.auto_for(spark.read.parquet(src).schema, block_rows=64)
    encode_parquet_dataset(spark, src, out, manifest=man, layout="wide")
    shutil.copytree(out, old)
    blocks = spark.read.parquet(os.path.join(out, "blocks"))
    stripped = blocks.drop(
        *[
            col
            for col in blocks.columns
            if col.endswith("__n_null") or col.endswith("__zsum_i")
        ]
    )
    shutil.rmtree(os.path.join(old, "blocks"))
    stripped.write.parquet(os.path.join(old, "blocks"))
    stats = {r.column: r for r in dataset_column_stats(spark, old).collect()}
    assert stats["a"].n_nonnull is None and stats["a"].sum_i is None
    assert stats["a"].n_sum_unstated == stats["a"].n_blocks
    # extrema still served from the zone maps
    assert (stats["a"].vmin_i, stats["a"].vmax_i) == (0, 127)
