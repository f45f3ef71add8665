"""The north-rule deployment mode, actually executed: build the
``--py-files`` archive and launch ``jobs/encode_job.py`` through real
``spark-submit`` in a separate JVM.

The subprocess runs with cwd OUTSIDE the repo, so ``xml2arrow_spark`` is
importable only from the shipped zip — on driver AND executors (the fused
encode path runs mapInArrow functions that the workers must unpickle
against the zip). This pins the whole deployment contract: archive build,
module shipping, job CLI, resume-capable sink, and bit-identical decode.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_pyfiles_encode_job(spark, sf_dir, tmp_path):
    from xml2arrow_spark.sources.tokens import tokenize_documents

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    tokens_dir = str(tmp_path / "tokens")
    tokenize_documents(docs).write.parquet(tokens_dir)

    zip_path = str(tmp_path / "xml2arrow_spark.zip")
    subprocess.run(
        ["sh", os.path.join(REPO, "tools", "make_pyfiles_zip.sh"), zip_path],
        check=True,
        cwd=REPO,
        capture_output=True,
    )
    assert os.path.getsize(zip_path) > 10_000

    out_dir = str(tmp_path / "encoded")
    env = {
        **os.environ,
        "PYSPARK_PYTHON": sys.executable,
        "PYSPARK_DRIVER_PYTHON": sys.executable,
    }
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--driver-memory", "4g",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.ui.showConsoleProgress=false",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "encode_job.py"),
            "--input", tokens_dir,
            "--output", out_dir,
            "--n-tasks", "4",
            "--decode-verify",
        ],
        cwd=str(tmp_path),  # repo not importable from here: zip or bust
        env=env,
        capture_output=True,
        text=True,
        timeout=360,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-4000:]}"
    metrics = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert metrics["decode_verify_mismatches"] == 0
    assert metrics["values"] > 0 and metrics["tokens_per_sec"] > 0
    # the sink actually materialized encoded blocks + sidecar metadata
    assert any(f.endswith(".parquet") for _r, _d, fs in os.walk(out_dir) for f in fs)


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_pyfiles_maintain_job(spark, sf_dir, tmp_path):
    """The maintenance surface through the real deployment path: a dataset
    bootstrapped in-process is UPSERTED and then AUDITED by separate
    spark-submit JVMs importing the engine from the shipped zip."""
    from pyspark.sql import functions as F

    from xml2arrow_spark.manifest import CodecManifest
    from xml2arrow_spark.operators.checkpoint import (
        encode_dataset,
        read_encoded_dataset,
    )
    from xml2arrow_spark.sources.tokens import tokenize_documents

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    tok = tokenize_documents(docs)
    ds = str(tmp_path / "ds")
    encode_dataset(tok, ds, CodecManifest.auto_for(tok.schema, block_rows=512), n_units=4)

    batch_dir = str(tmp_path / "batch")
    (
        tok.orderBy("doc_id").limit(12)
        .withColumn("tokens", F.expr("slice(tokens, 1, 6)"))
        .withColumn("n_tok", F.expr("CAST(size(tokens) AS INT)"))
    ).write.parquet(batch_dir)

    zip_path = str(tmp_path / "xml2arrow_spark.zip")
    subprocess.run(
        ["sh", os.path.join(REPO, "tools", "make_pyfiles_zip.sh"), zip_path],
        check=True, cwd=REPO, capture_output=True,
    )
    env = {
        **os.environ,
        "PYSPARK_PYTHON": sys.executable,
        "PYSPARK_DRIVER_PYTHON": sys.executable,
    }

    def submit(*job_args):
        return subprocess.run(
            [
                SPARK_SUBMIT,
                "--master", "local[4]",
                "--driver-memory", "4g",
                "--conf", "spark.sql.shuffle.partitions=4",
                "--conf", "spark.ui.enabled=false",
                "--conf", "spark.ui.showConsoleProgress=false",
                "--py-files", zip_path,
                os.path.join(REPO, "jobs", "maintain_job.py"),
                "--dataset", ds,
                *job_args,
            ],
            cwd=str(tmp_path),  # repo not importable from here: zip or bust
            env=env, capture_output=True, text=True, timeout=360,
        )

    p1 = submit("--action", "upsert", "--rows", batch_dir)
    assert p1.returncode == 0, f"stdout:\n{p1.stdout}\nstderr:\n{p1.stderr[-4000:]}"
    m = json.loads([l for l in p1.stdout.splitlines() if l.startswith("{")][-1])
    assert m["rows_replaced"] == 12 and m["rows_inserted"] == 0

    p2 = submit("--action", "audit", "--deep")
    assert p2.returncode == 0, f"stdout:\n{p2.stdout}\nstderr:\n{p2.stderr[-4000:]}"
    rep = json.loads([l for l in p2.stdout.splitlines() if l.startswith("{")][-1])
    assert rep["base"]["ok"] and rep["base"]["deep_rows"] == tok.count()

    # the in-process session sees the subprocess's mutation
    spark.catalog.refreshByPath(os.path.join(ds, "blocks"))
    batch = spark.read.parquet(batch_dir)
    expect = tok.join(batch.select("doc_id"), "doc_id", "left_anti").unionByName(batch)
    got = read_encoded_dataset(spark, ds)
    assert got.count() == expect.count()
    assert (
        expect.alias("a").join(got.alias("b"), "doc_id")
        .filter("a.tokens IS DISTINCT FROM b.tokens").count() == 0
    )

    # merge-on-read tier through the same deployment path: tombstone a
    # 3-id batch, fold it, vacuum the tree — three more separate JVMs
    ids_dir = str(tmp_path / "doomed")
    tok.select("doc_id").orderBy("doc_id").limit(3).write.parquet(ids_dir)
    p3 = submit("--action", "tombstone", "--ids", ids_dir)
    assert p3.returncode == 0, f"stderr:\n{p3.stderr[-4000:]}"
    m3 = json.loads([l for l in p3.stdout.splitlines() if l.startswith("{")][-1])
    assert m3["ids_tombstoned"] == 3
    p4 = submit("--action", "apply-tombstones")
    assert p4.returncode == 0, f"stderr:\n{p4.stderr[-4000:]}"
    m4 = json.loads([l for l in p4.stdout.splitlines() if l.startswith("{")][-1])
    assert m4["rows_deleted"] == 3
    p5 = submit("--action", "vacuum")
    assert p5.returncode == 0, f"stderr:\n{p5.stderr[-4000:]}"
    spark.catalog.refreshByPath(os.path.join(ds, "blocks"))
    assert read_encoded_dataset(spark, ds).count() == expect.count() - 3

    # clustering maintenance through the same deployment path: a FUSED
    # FILE dataset reclustered by a separate JVM; the in-process session
    # verifies the rewrite decodes row-identical and the sidecar records
    # the sort
    from xml2arrow_spark.operators.dataset import (
        decode_dataset,
        encode_parquet_dataset,
    )

    fsrc = str(tmp_path / "fsrc")
    fds = str(tmp_path / "fds")
    rdst = str(tmp_path / "rdst")
    (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .select("l_orderkey", "l_linenumber")
        .repartition(4)
        .write.parquet(fsrc)
    )
    encode_parquet_dataset(spark, fsrc, fds)
    p6 = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--driver-memory", "4g",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.ui.showConsoleProgress=false",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "maintain_job.py"),
            "--dataset", fds,
            "--action", "recluster",
            "--out", rdst,
            "--presort", "l_orderkey",
            "--n-files", "4",
        ],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=360,
    )
    assert p6.returncode == 0, f"stdout:\n{p6.stdout}\nstderr:\n{p6.stderr[-4000:]}"
    m6 = json.loads([l for l in p6.stdout.splitlines() if l.startswith("{")][-1])
    assert m6["n_files"] == 4
    assert decode_dataset(spark, rdst).count() == decode_dataset(spark, fds).count()
    import yaml

    with open(os.path.join(rdst, "_manifest.yaml")) as f:
        assert yaml.safe_load(f.read()).get("presort") == ["l_orderkey"]
