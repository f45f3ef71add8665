"""Round-4 hardening: compaction rerun/crash safety, idempotent row-level
sink (see test_checkpoint.py), vectorized IVF assignment, conjunctive zone
filters, band-partitioned signature storage, max_cell telemetry."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from xml2arrow_spark.operators.dataset import (
    compact_dataset,
    decode_dataset,
    encode_parquet_dataset,
)
from xml2arrow_spark.sources import tokens_dataframe


def _tok_df(spark, n):
    return tokens_dataframe(spark, n, variant="uniform_vocab", n_partitions=4)


def _blocks(out):
    d = os.path.join(out, "blocks")
    return sorted(f for f in os.listdir(d) if f.endswith(".parquet"))


# -- compaction rerun / crash safety (ADVICE r03 high) -------------------------


def test_recompact_shrink_preserves_rows(spark, tmp_path):
    """The previously-untested shrink path: compact to 6 files, then
    re-compact THOSE OUTPUTS to 2 — a second run whose inputs are compact
    files from an earlier generation. Generation-unique output names mean
    no new output path can collide with an input; row multiset invariant."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "ds")
    _tok_df(spark, 96).repartition(12).write.mode("overwrite").parquet(src)
    encode_parquet_dataset(spark, src, out)
    before = sorted(r.doc_id for r in decode_dataset(spark, out).collect())

    s1 = compact_dataset(spark, out, target_files=6)
    assert s1["files_after"] <= 6
    gen1 = _blocks(out)
    assert all(f.startswith("compact-g0000-") for f in gen1)

    s2 = compact_dataset(spark, out, target_files=2)
    gen2 = _blocks(out)
    assert s2["files_after"] <= 2 and len(gen2) == s2["files_after"]
    assert all(f.startswith("compact-g0001-") for f in gen2)
    assert not (set(gen1) & set(gen2))  # outputs never reuse input names

    after = sorted(r.doc_id for r in decode_dataset(spark, out).collect())
    assert after == before
    # the compact log recorded both generations
    log = spark.read.parquet(os.path.join(out, "compact_log"))
    assert set(r.gen for r in log.select("gen").distinct().collect()) == {0, 1}


def test_compact_crash_leftover_swept(spark, tmp_path):
    """Crash window between rename and removal: a covered original left on
    disk must be swept (its rows already live in the compact file), not
    double-decoded — including TRANSITIVELY after another compaction
    generation consumed the covering file."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "ds")
    _tok_df(spark, 96).repartition(12).write.mode("overwrite").parquet(src)
    encode_parquet_dataset(spark, src, out)
    blocks_dir = os.path.join(out, "blocks")
    keep_copy = str(tmp_path / "keep.parquet")
    victim = os.path.join(blocks_dir, _blocks(out)[0])
    shutil.copy(victim, keep_copy)
    n_rows = decode_dataset(spark, out).count()

    compact_dataset(spark, out, target_files=4)
    # simulate the crash leftover: the original reappears next to the
    # compact file that already contains its rows
    shutil.copy(keep_copy, victim)
    assert decode_dataset(spark, out).count() > n_rows  # duplicated now

    compact_dataset(spark, out, target_files=2)  # sweep + next generation
    assert decode_dataset(spark, out).count() == n_rows

    # transitive case: leftover reappears AFTER its covering g-file was
    # itself compacted away into generation 2
    shutil.copy(keep_copy, victim)
    compact_dataset(spark, out, target_files=1)
    assert decode_dataset(spark, out).count() == n_rows
