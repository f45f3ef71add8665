#!/usr/bin/env python
"""Dataset-maintenance entrypoint — the ``spark-submit --py-files``
deployment of the row-level storage surface (the same discipline as
jobs/encode_job.py: the north rule's jobs run on a cluster through
spark-submit, not a notebook).

    spark-submit --py-files xml2arrow_spark.zip jobs/maintain_job.py \
        --dataset <encoded dataset dir> --action ACTION [inputs...]

Actions (one JSON metrics line on stdout, non-zero exit on failure):

    delete      --ids  <parquet dir with the id column>
    tombstone   --ids  <parquet dir>  (merge-on-read soft delete, O(batch))
    apply-tombstones        (fold every pending tombstone into the blocks)
    upsert      --rows <parquet dir with every encoded column>
    add-family  --rows <parquet dir: id + new columns> --family NAME
    lookup      --ids  <parquet dir> --out <parquet dir for the rows>
    snapshot    --tag NAME  (zero-copy freeze)
    expire-snapshots [--keep a,b] [--retain-last N]
    vacuum                  (crash-debris GC sweep; no active writers)
    audit       [--deep]   (exit 1 if any tree fails reconciliation)
    recluster   --out <new dataset dir> --presort col[,col...]
                [--cluster lex|zorder] [--n-files N] [--columns a,b]
                (rewrite a FUSED FILE dataset sorted by new clustering
                keys into a new directory — the rewrite_data_files
                (sort_order) maintenance pass; the source never mutates)

Build the --py-files archive with ``tools/make_pyfiles_zip.sh``.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    ap.add_argument(
        "--action", required=True,
        choices=[
            "delete", "tombstone", "apply-tombstones", "upsert",
            "add-family", "lookup", "snapshot", "expire-snapshots",
            "vacuum", "audit", "recluster",
        ],
    )
    ap.add_argument("--presort", default=None,
                    help="recluster: comma-separated clustering columns")
    ap.add_argument("--cluster", default="lex", choices=["lex", "zorder"])
    ap.add_argument("--n-files", type=int, default=None,
                    help="recluster: output unit count")
    ap.add_argument("--columns", default=None,
                    help="recluster: comma-separated projection (drop columns)")
    ap.add_argument("--ids", default=None, help="parquet dir of ids")
    ap.add_argument("--rows", default=None, help="parquet dir of row batches")
    ap.add_argument("--family", default=None)
    ap.add_argument("--out", default=None, help="lookup output parquet dir")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--deep", action="store_true", help="audit: decode + CRC")
    ap.add_argument("--tag", default=None, help="snapshot tag")
    ap.add_argument("--keep", default=None,
                    help="expire-snapshots: comma-separated tags to keep")
    ap.add_argument("--retain-last", type=int, default=None,
                    help="expire-snapshots: keep the N newest")
    args = ap.parse_args()

    from xml2arrow_spark.env import recommended_spark_confs, set_kernel_malloc_env

    set_kernel_malloc_env()

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName(f"xml2arrow-maintain-{args.action}")
    for k, v in recommended_spark_confs().items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from xml2arrow_spark.operators import checkpoint as cp

    def _need(opt, name):
        if opt is None:
            print(f"--{name} is required for --action {args.action}",
                  file=sys.stderr)
            raise SystemExit(2)
        return opt

    if args.action == "delete":
        ids = spark.read.parquet(_need(args.ids, "ids"))
        out = cp.delete_rows(ids, args.dataset, id_col=args.id_col)
    elif args.action == "tombstone":
        from xml2arrow_spark.operators.tombstones import tombstone_rows

        ids = spark.read.parquet(_need(args.ids, "ids"))
        out = tombstone_rows(ids, args.dataset, id_col=args.id_col)
    elif args.action == "apply-tombstones":
        from xml2arrow_spark.operators.tombstones import apply_tombstones

        out = apply_tombstones(spark, args.dataset, id_col=args.id_col)
    elif args.action == "snapshot":
        from xml2arrow_spark.operators.snapshot import snapshot_dataset

        out = snapshot_dataset(args.dataset, _need(args.tag, "tag"))
    elif args.action == "expire-snapshots":
        from xml2arrow_spark.operators.snapshot import expire_snapshots

        out = {
            "dropped": expire_snapshots(
                args.dataset,
                keep=args.keep.split(",") if args.keep else None,
                retain_last=args.retain_last,
            )
        }
    elif args.action == "vacuum":
        from xml2arrow_spark.operators.snapshot import vacuum

        out = vacuum(args.dataset)
    elif args.action == "upsert":
        rows = spark.read.parquet(_need(args.rows, "rows"))
        out = cp.upsert_rows(rows, args.dataset, id_col=args.id_col)
    elif args.action == "add-family":
        rows = spark.read.parquet(_need(args.rows, "rows"))
        out = cp.add_columns(
            rows, args.dataset, _need(args.family, "family"), id_col=args.id_col
        )
    elif args.action == "recluster":
        from xml2arrow_spark.operators.dataset import recluster_dataset

        out = recluster_dataset(
            spark, args.dataset, _need(args.out, "out"),
            presort=_need(args.presort, "presort").split(","),
            cluster=args.cluster, n_files=args.n_files,
            columns=args.columns.split(",") if args.columns else None,
        )
    elif args.action == "lookup":
        ids = spark.read.parquet(_need(args.ids, "ids"))
        got = cp.lookup_rows(ids, args.dataset, id_col=args.id_col)
        got.write.mode("overwrite").parquet(_need(args.out, "out"))
        out = {"rows_found": spark.read.parquet(args.out).count()}
    else:  # audit
        out = cp.audit_dataset(spark, args.dataset, deep=args.deep)
        print(json.dumps(out))
        return 0 if all(t["ok"] for t in out.values()) else 1

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
