"""Physical-plan shape audits: the properties that keep the engine viable at
100 TB, pinned as tests so a refactor can't silently reintroduce a shuffle or
unprune a scan. (SURVEY §4: what Catalyst gives us must stay given.)
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from xml2arrow_spark.manifest import CodecManifest
from xml2arrow_spark.operators.encode import (
    decode_table,
    encode_parquet,
    encode_table,
)
from xml2arrow_spark.operators.partitioning import repartition_by_work
from xml2arrow_spark.sources.tokens import generate_tokens_arrow

TOKENS_DDL = "doc_id string, tokens array<int>, n_tok int, source string"


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.fixture(scope="module")
def token_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("plans_tok"))
    for i in range(3):
        pq.write_table(
            generate_tokens_arrow(400, variant="uniform_vocab", seed=i, start_id=1000 * i),
            f"{d}/p{i}.parquet",
        )
    return d


def test_fused_encode_plan_is_shuffle_free(spark, token_dir):
    """File-task planning happens on the driver; the encode stage itself must
    be map-only — at 10^12 sequences any payload exchange here is petabytes."""
    blocks = encode_parquet(spark, token_dir, n_tasks=2)
    plan = _plan(blocks)
    assert "Exchange" not in plan
    assert "MapInArrow" in plan


def test_decode_plan_is_shuffle_free(spark, token_dir):
    """Blocks are self-describing: decode needs no join and no shuffle."""
    blocks = encode_parquet(spark, token_dir, n_tasks=2)
    decoded = decode_table(blocks, TOKENS_DDL)
    plan = _plan(decoded)
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_encode_table_prunes_scan_to_manifest_columns(spark, token_dir):
    """Column pruning must reach the parquet scan (the engine's analog of the
    reference's unknown-subtree skip): encoding only `tokens` may not read
    doc_id/source bytes."""
    df = spark.read.parquet(token_dir)
    manifest = CodecManifest.auto_for(df.select("tokens").schema, block_rows=1024)
    blocks = encode_table(df, manifest)
    plan = _plan(blocks)
    scan_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan_schema, plan
    assert "tokens" in scan_schema[0]
    assert "doc_id" not in scan_schema[0]
    assert "source" not in scan_schema[0]


def test_repartition_by_work_is_single_range_exchange(spark, token_dir):
    """Explicit work balancing = exactly one range exchange, nothing hidden."""
    df = spark.read.parquet(token_dir)
    out = repartition_by_work(df, 4)
    plan = _plan(out)
    # formatted explain prints each node in the tree AND the detail section
    assert plan.count("- Exchange") == 1
    assert "rangepartitioning" in plan.lower()


def test_encode_table_plan_has_single_exchange_with_units(spark, token_dir):
    """unit_col mode: one hash exchange (unit co-location), then map-only."""
    from xml2arrow_spark.operators.checkpoint import plan_units

    df = plan_units(spark.read.parquet(token_dir), 4)
    manifest = CodecManifest.auto_for(
        spark.read.parquet(token_dir).schema, block_rows=1024
    )
    blocks = encode_table(df.repartition(4, "unit_id"), manifest, unit_col="unit_id")
    plan = _plan(blocks)
    assert plan.count("- Exchange") == 1
