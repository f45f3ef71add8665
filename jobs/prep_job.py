#!/usr/bin/env python
"""Production corpus-prep entrypoint — the full training-data pipeline as a
``spark-submit`` job:

    spark-submit --py-files xml2arrow_spark.zip jobs/prep_job.py \
        --input  <parquet dir of documents(doc_id,text,source,n_chars)> \
        --output <encoded dataset dir> \
        --sig-table <parquet dir for the MinHash signature table> \
        [--incremental] [--max-cell M] [--n-tasks N]

Stages (each an oracle-gated operator; see pipeline/prep.py):
quality filter -> exact dedup -> LSH near-dup pairs (two-phase signature
table at --sig-table, hot cells capped at --max-cell) -> connected-component
resolution -> tokenize -> encode_dataset (resume-safe blocks + manifest).

``--incremental`` treats --input as a NEW batch against an EXISTING
signature table: near-dup pairs are generated with
``lsh_near_dup_pairs_incremental`` (the historical corpus is never
re-minhashed; its internal pairs are never re-reported), and new docs that
resolve to an OLD canonical document are dropped.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# local runs (python jobs/prep_job.py) find the package next to jobs/;
# cluster runs get it from --py-files
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--sig-table", required=True)
    ap.add_argument("--incremental", action="store_true")
    ap.add_argument(
        "--eval-dir", default=None,
        help="parquet dir of evaluation documents (doc_id, text, ...); "
        "training docs sharing >= --eval-overlap trigram shingles with "
        "any eval doc are dropped (benchmark decontamination)",
    )
    ap.add_argument("--eval-overlap", type=int, default=2)
    ap.add_argument("--max-cell", type=int, default=None)
    ap.add_argument(
        "--resolve-checkpoint-dir",
        default=None,
        help="reliable parquet checkpoint dir for connected-components "
        "resolution (HDFS/S3 on a cluster): survives executor loss and "
        "resumes a killed run from the last committed round; default is "
        "the localCheckpoint fast path (single-JVM only)",
    )
    ap.add_argument("--n-tasks", type=int, default=None)
    ap.add_argument("--n-units", type=int, default=64)
    ap.add_argument("--block-rows", type=int, default=65536)
    args = ap.parse_args()

    from xml2arrow_spark.env import recommended_spark_confs, set_kernel_malloc_env

    set_kernel_malloc_env()

    from pyspark.sql import SparkSession, functions as F

    builder = SparkSession.builder.appName("xml2arrow-prep")
    for k, v in recommended_spark_confs().items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from xml2arrow_spark.manifest import CodecManifest
    from xml2arrow_spark.operators.checkpoint import encode_dataset
    from xml2arrow_spark.pipeline import dedup, textstats
    from xml2arrow_spark.plans.selector import resolve_manifest
    from xml2arrow_spark.sources.tokens import tokenize_documents

    t0 = time.time()
    docs = spark.read.parquet(args.input)
    n_in = docs.count()

    q = textstats.quality_filter(docs).select("doc_id")
    qdocs = docs.join(q, "doc_id", "left_semi")
    keep = qdocs.groupBy("text").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    exact_kept = qdocs.join(keep, "doc_id", "left_semi")

    n_contaminated = 0
    contamination_cache = None
    if args.eval_dir:
        # benchmark decontamination BEFORE the expensive near-dup stage:
        # leaked docs must not survive, and dropping them early shrinks
        # the minhash input. The hit set is PERSISTED: exact_kept's
        # lineage embeds the anti-join, so without the cache the
        # corpus-wide shingle explode+join would recompute inside every
        # downstream action (sig write, tokenize, encode — measured ~3x).
        eval_docs = spark.read.parquet(args.eval_dir)
        hits = dedup.contamination_hits(
            exact_kept, eval_docs, min_overlap=args.eval_overlap
        ).persist()
        contamination_cache = hits
        n_contaminated = hits.count()
        exact_kept = exact_kept.join(
            hits.select("doc_id"), "doc_id", "left_anti"
        )

    if args.incremental:
        pairs = dedup.lsh_near_dup_pairs_incremental(
            exact_kept, args.sig_table, max_cell=args.max_cell
        )
    else:
        pairs = dedup.lsh_near_dup_pairs(
            exact_kept, sig_path=args.sig_table, max_cell=args.max_cell
        )
    labels = dedup.resolve_near_dups(
        pairs, checkpoint_dir=args.resolve_checkpoint_dir
    )
    drop = labels.filter(F.col("label") != F.col("node")).select(
        F.col("node").alias("doc_id")
    )
    survivors = exact_kept.join(drop, "doc_id", "left_anti")

    tok = tokenize_documents(survivors)
    manifest = resolve_manifest(
        tok, CodecManifest.auto_for(tok.schema, block_rows=args.block_rows)
    )
    # Incremental batches encode into their OWN dataset directory: the
    # unit-resume manifest of a previous batch would otherwise mark every
    # unit id complete and silently anti-join the new batch away. A batch
    # dir is reused ONLY when its recorded input matches this run's
    # (re-submitting a crashed batch resumes it; a new input always gets a
    # fresh directory — unit-level resume is only meaningful within one
    # input).
    if args.incremental:
        os.makedirs(args.output, exist_ok=True)
        existing = sorted(
            d for d in os.listdir(args.output) if d.startswith("batch-")
        )
        batch_dir = None
        if existing:
            last = os.path.join(args.output, existing[-1])
            marker = os.path.join(last, ".batch_input")
            if os.path.exists(marker) and open(marker).read() == args.input:
                batch_dir = last  # same batch re-submitted: resume it
        if batch_dir is None:
            batch_dir = os.path.join(args.output, f"batch-{len(existing):06d}")
            os.makedirs(batch_dir, exist_ok=True)
            with open(os.path.join(batch_dir, ".batch_input"), "w") as f:
                f.write(args.input)
    else:
        batch_dir = args.output
    metrics = encode_dataset(tok, batch_dir, manifest, n_units=args.n_units)
    wall = time.time() - t0
    # --max-cell is never a silent cap: report how many band cells (and
    # band rows) the skew valve dropped from candidate generation
    if getattr(pairs, "_drop_metrics", None) is not None:
        d = pairs._drop_metrics.collect()[0]
        metrics.update(
            {
                "n_cells_dropped": int(d["n_cells_dropped"]),
                "n_band_rows_dropped": int(d["n_rows_dropped"]),
            }
        )
    metrics.update(
        {
            "docs_in": n_in,
            "docs_contaminated": n_contaminated,
            "docs_out": metrics["rows"],
            "batch_dir": batch_dir,
            "wall_sec": round(wall, 2),
            "incremental": bool(args.incremental),
        }
    )
    print(json.dumps(metrics))
    if contamination_cache is not None:
        contamination_cache.unpersist()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
