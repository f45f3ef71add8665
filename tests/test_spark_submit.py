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
