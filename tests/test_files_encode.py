"""Fused pyarrow scan+encode path: planning balance, roundtrip equality,
parity with the DataFrame encode path, and driver-side manifest resolution.

Mirrors the reference's file-level integration tests
(/root/reference/tests/integration_tests.rs:27-113): whole-file in, exact
columnar values out.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from xml2arrow_spark.manifest import CodecManifest
from xml2arrow_spark.operators.encode import (
    decode_table,
    encode_parquet,
    encode_parquet_tasks,
    encode_table,
    resolve_manifest_parquet,
)
from xml2arrow_spark.sources.files import (
    _lpt_assign,
    parquet_file_infos,
    plan_parquet_tasks,
)
from xml2arrow_spark.sources.tokens import generate_tokens_arrow

TOKENS_DDL = "doc_id string, tokens array<int>, n_tok int, source string"


@pytest.fixture(scope="module")
def token_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tokdir"))
    for i in range(7):
        tbl = generate_tokens_arrow(400 + 150 * i, variant="uniform_vocab",
                                    seed=100 + i, start_id=10_000 * i)
        pq.write_table(tbl, os.path.join(d, f"part-{i}.parquet"))
    return d


def test_lpt_assignment_balances_sizes():
    sizes = [100, 90, 30, 30, 25, 20, 10, 5]
    bins = _lpt_assign(sizes, 3)
    loads = [0, 0, 0]
    for i, b in enumerate(bins):
        loads[b] += sizes[i]
    # optimal makespan is 105; LPT guarantees <= 4/3 OPT
    assert max(loads) <= 140
    assert len(set(bins)) == 3


def test_parquet_file_infos_lists_sorted(token_dir):
    infos = parquet_file_infos(token_dir)
    assert len(infos) == 7
    assert [p for p, _ in infos] == sorted(p for p, _ in infos)
    assert all(s > 0 for _, s in infos)


def test_plan_parquet_tasks_covers_all_files(spark, token_dir):
    tasks = plan_parquet_tasks(spark, token_dir, n_tasks=3)
    rows = tasks.collect()
    assert len(rows) == 3  # one row per task bin
    assert sorted(i for r in rows for i in r.file_idx) == list(range(7))
    assert set(r.task_id for r in rows) == {0, 1, 2}
    # exactly one bin per Spark partition (the scaling-critical invariant)
    assert tasks.rdd.getNumPartitions() == 3
    per_part = tasks.rdd.glom().map(len).collect()
    assert all(n == 1 for n in per_part)


def test_fused_encode_roundtrip_bit_identical(spark, token_dir):
    blocks = encode_parquet(spark, token_dir, n_tasks=3)
    decoded = decode_table(blocks, TOKENS_DDL)
    src = spark.read.parquet(token_dir)
    assert decoded.exceptAll(src).count() == 0
    assert src.exceptAll(decoded).count() == 0


def test_fused_unit_id_is_file_idx(spark, token_dir):
    blocks = encode_parquet(spark, token_dir, n_tasks=3)
    units = sorted(r.unit_id for r in blocks.select("unit_id").distinct().collect())
    assert units == list(range(7))


def test_fused_matches_dataframe_path_sizes(spark, token_dir):
    """Same manifest -> same total encoded bytes on both paths (the kernels
    are shared; only the transport differs)."""
    manifest = CodecManifest.auto_for(
        spark.read.parquet(token_dir).schema, block_rows=100_000
    )
    resolved = resolve_manifest_parquet(token_dir, manifest)
    fused = encode_parquet(spark, token_dir, resolved, n_tasks=1)
    # one unit per file on the fused path; compare per-file against
    # encode_table over the same single file
    f_tot = fused.agg(F.sum("out_bytes").alias("ob"), F.sum("n_values").alias("nv")).collect()[0]
    infos = parquet_file_infos(token_dir)
    df_ob = 0
    df_nv = 0
    for path, _ in infos:
        sub = spark.read.parquet(path)
        agg = encode_table(sub.coalesce(1), resolved).agg(
            F.sum("out_bytes").alias("ob"), F.sum("n_values").alias("nv")
        ).collect()[0]
        df_ob += int(agg["ob"])
        df_nv += int(agg["nv"])
    assert int(f_tot["nv"]) == df_nv
    assert int(f_tot["ob"]) == df_ob


def test_resolve_manifest_parquet_picks_expected_codecs(token_dir):
    # resolution is pure pyarrow; no Spark session needed
    import pyspark.sql.types as T

    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ])
    resolved = resolve_manifest_parquet(
        token_dir, CodecManifest.auto_for(schema, block_rows=4096)
    )
    assert all(p.codec != "auto" for p in resolved.columns.values())
    assert resolved.columns["tokens"].codec in {"for", "bitpack"}
    assert resolved.columns["source"].codec in {"dict_str", "seq_str"}


def test_encode_parquet_single_file(spark, token_dir):
    one = parquet_file_infos(token_dir)[0][0]
    blocks = encode_parquet(spark, one, n_tasks=4)
    decoded = decode_table(blocks, TOKENS_DDL)
    src = spark.read.parquet(one)
    assert decoded.count() == src.count()
    assert decoded.exceptAll(src).count() == 0


def test_encode_parquet_missing_path_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        encode_parquet(spark, str(tmp_path / "nope"))


def test_fused_auto_cascade_resolves_bss_on_reduced_precision_floats(
    spark, tmp_path
):
    """The fused stats/encode path resolves ``auto+zstd`` float-list columns
    through the cascade-aware chooser: on bf16-upcast float32 embeddings
    (two all-zero mantissa byte planes) it must pick bss_float, and the
    encoded bytes must beat the forced plain_float+zstd encode of the same
    table (measured ~0.72x; the r05 regression this pins was
    resolve_manifest_parquet dropping the cascade before the probe ran)."""
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(23)
    n_vec, dim = 4000, 64
    flat = (
        rng.normal(size=n_vec * dim).astype(np.float32).view(np.uint32)
        & np.uint32(0xFFFF0000)
    ).view(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n_vec, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(flat), dim
            ).cast(pa.list_(pa.float32())),
        }
    )
    d = str(tmp_path / "bf16emb")
    os.makedirs(d)
    pq.write_table(tbl, os.path.join(d, "part-0.parquet"))
    schema = spark.read.parquet(d).schema

    def total_out(codec):
        man = CodecManifest.auto_for(schema, block_rows=4096)
        man.columns["embedding"].codec = codec
        from xml2arrow_spark.operators.encode import encode_parquet_stats

        row = (
            encode_parquet_stats(spark, d, manifest=man, n_tasks=2)
            .agg(F.sum("out_bytes").alias("ob"))
            .collect()[0]
        )
        return int(row["ob"])

    auto_bytes = total_out("auto+zstd")
    plain_bytes = total_out("plain_float+zstd")
    assert auto_bytes < plain_bytes
    # and the driver-side resolver itself names the codec
    man = CodecManifest.auto_for(schema, block_rows=4096)
    man.columns["embedding"].codec = "auto+zstd"
    resolved = resolve_manifest_parquet(d, man)
    assert resolved.columns["embedding"].codec == "bss_float+zstd"
    # roundtrip through the real encode (not just stats) stays bit-exact
    blocks = encode_parquet_tasks(
        plan_parquet_tasks(spark, d, n_tasks=2), resolved
    )
    decoded = decode_table(blocks, "vec_id bigint, embedding array<float>")
    got = decoded.orderBy("vec_id").collect()
    assert len(got) == n_vec
    emb0 = np.array(got[0]["embedding"], dtype=np.float32)
    np.testing.assert_array_equal(
        emb0.view(np.uint32), flat[:dim].view(np.uint32)
    )
