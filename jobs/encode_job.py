#!/usr/bin/env python
"""Production encode entrypoint — the ``spark-submit --py-files`` job from
BASELINE.json's north rule.

    spark-submit --py-files xml2arrow_spark.zip jobs/encode_job.py \
        --input  <parquet/Iceberg-data dir of (doc_id, tokens, n_tok, source)> \
        --output <encoded dataset dir> \
        [--manifest manifest.yaml] [--n-tasks N] [--decode-verify]

Runs the fused scan->encode->sink pipeline with per-file resume lineage:
re-submitting after a failure encodes only units missing from the metadata
table. On a cluster, executor counts come from spark-submit
(``--num-executors N`` vs ``4N`` for the scaling runs); this script is
agnostic — it plans one task per core by default.

Build the --py-files archive with ``tools/make_pyfiles_zip.sh``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--manifest", default=None, help="codec manifest YAML; auto if omitted")
    ap.add_argument("--n-tasks", type=int, default=None)
    ap.add_argument("--block-rows", type=int, default=65536)
    ap.add_argument("--decode-verify", action="store_true",
                    help="decode everything back and assert bit-identical vs input")
    ap.add_argument("--bench-reps", type=int, default=1,
                    help="benchmark mode: run the encode this many times in "
                         "the SAME JVM into fresh output subdirs after one "
                         "untimed warm-up, and report the MIN timed wall "
                         "(this VM's best-of-N discipline; 1 = normal job)")
    args = ap.parse_args()

    from xml2arrow_spark.env import recommended_spark_confs, set_kernel_malloc_env

    set_kernel_malloc_env()

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("xml2arrow-encode")
    for k, v in recommended_spark_confs().items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from xml2arrow_spark.manifest import CodecManifest
    from xml2arrow_spark.operators.dataset import decode_dataset, encode_parquet_dataset

    manifest = CodecManifest.from_yaml_file(args.manifest) if args.manifest else None
    if manifest is not None and manifest.block_rows != args.block_rows:
        manifest = CodecManifest(
            columns=manifest.columns, block_rows=args.block_rows,
            version=manifest.version, zone_maps=manifest.zone_maps,
        )

    if args.bench_reps > 1:
        # in-JVM best-of-N: rep 0 is an untimed warm-up (python-worker
        # startup + codegen are per-JVM fixed costs, not encode costs);
        # each rep encodes into a fresh subdir so the sink's resume
        # lineage cannot skip work between reps
        import shutil

        metrics, wall, rep_walls = None, None, []
        for rep in range(args.bench_reps + 1):
            rep_out = os.path.join(args.output, f"rep{rep}")
            shutil.rmtree(rep_out, ignore_errors=True)
            t0 = time.time()
            m = encode_parquet_dataset(
                spark, args.input, rep_out, manifest=manifest,
                n_tasks=args.n_tasks,
            )
            w = time.time() - t0
            if rep > 0:
                rep_walls.append(round(w, 2))
                if wall is None or w < wall:
                    metrics, wall = m, w
            if rep < args.bench_reps:
                shutil.rmtree(rep_out, ignore_errors=True)
        metrics["bench_reps"] = args.bench_reps
        metrics["rep_walls"] = rep_walls
        args.output = os.path.join(args.output, f"rep{args.bench_reps}")
    else:
        t0 = time.time()
        metrics = encode_parquet_dataset(
            spark, args.input, args.output, manifest=manifest,
            n_tasks=args.n_tasks,
        )
        wall = time.time() - t0
    metrics["wall_sec"] = round(wall, 2)
    metrics["tokens_per_sec"] = round(metrics["values"] / wall) if wall else None

    if args.decode_verify:
        decoded = decode_dataset(spark, args.output, n_tasks=args.n_tasks)
        src = spark.read.parquet(args.input)
        mismatches = decoded.exceptAll(src).count() + src.exceptAll(decoded).count()
        metrics["decode_verify_mismatches"] = mismatches
        if mismatches:
            print(json.dumps(metrics))
            print("FATAL: decode is not bit-identical", file=sys.stderr)
            return 1

    print(json.dumps(metrics))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
