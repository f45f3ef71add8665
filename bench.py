#!/usr/bin/env python
"""Headline benchmark. Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Covers the engine's flagship paths at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]:

- synthetic-token encode (the north-rule workload): generate the F1 token
  table on executors, range-partition by work, encode with auto-selected
  codecs; reports tokens/sec and compression vs parquet-zstd of the SAME
  table (the reference-codec size baseline from BASELINE.md).
- tokenize→encode→decode round trip over the documents table.
- dedup (exact, MinHash+LSH pairs, simhash groups), text analysis
  (lang-id/quality/fingerprint), similarity (brute-force + LSH ANN),
  un-nesting over lineitem.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ENCODE_ROWS = int(os.environ.get("SPARK_GRAFT_ENCODE_ROWS", "200000"))
# Per-query repetitions; the headline records the MIN. This VM shows 2-3x
# run-to-run wall-clock noise on n=1 samples (tools/scaling_bench.py's
# best-of-4 data; the BENCH_r02 q1 "2.4x regression" was exactly such a
# sample), so a single-shot headline measures the memory controller's mood,
# not the engine. All reps run inside one JVM; per-rep times are emitted as
# ``query_runs`` so variance stays visible.
BEST_OF = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))


def main() -> None:
    from xml2arrow_spark.env import set_kernel_malloc_env

    set_kernel_malloc_env()  # before the JVM/worker daemon starts

    from pyspark.sql import SparkSession, functions as F

    from xml2arrow_spark.manifest import CodecManifest
    from xml2arrow_spark.operators.dataset import encode_parquet_dataset
    from xml2arrow_spark.operators.encode import (
        decode_table,
        encode_parquet,
        encode_parquet_stats,
        encode_table,
    )
    from xml2arrow_spark.pipeline import dedup, similarity, textstats
    from xml2arrow_spark.plans.selector import resolve_manifest
    from xml2arrow_spark.sources.tokens import tokenize_documents, tokens_dataframe

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("xml2arrow_spark-bench")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        # Size file-scan splits for the core count: the synthetic input is
        # ~200 MB, and the default 128m split + 4m open cost would pack it
        # into a handful of tasks, serializing the encode stage.
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "512k")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries: dict[str, float] = {}
    baselines: dict[str, float] = {}  # reference-codec measurements, NOT engine work
    runs: dict[str, list[float]] = {}  # per-rep wall times (variance evidence)
    extra: dict[str, object] = {}

    def timed(name: str, into: dict | None = None):
        sink = queries if into is None else into

        class _T:
            def __enter__(self):
                self.t0 = time.time()
                return self

            def __exit__(self, *a):
                sink[name] = round(time.time() - self.t0, 3)

        return _T()

    def best_of(name: str, fn, setup=None, reps: int = BEST_OF):
        """Run ``fn`` ``reps`` times (untimed ``setup`` before each rep);
        record the min wall — the fair engine number on a noisy VM — plus
        every rep in ``runs``. Returns the last rep's result."""
        # reclaim the previous query's broadcast/codegen garbage before
        # timing: measured 4-10x rep inflation on late queries when the
        # JVM enters the measurement under memory pressure
        spark.sparkContext._jvm.System.gc()
        result = None
        for _ in range(reps):
            if setup is not None:
                setup()
            t0 = time.time()
            result = fn()
            runs.setdefault(name, []).append(round(time.time() - t0, 3))
        queries[name] = min(runs[name])
        return result

    # -- q1: token-table encode (north-rule workload) -------------------------
    # The north workload *ingests an Iceberg table*: materialize the synthetic
    # token table to parquet once (untimed setup — it is the input, not the
    # engine), then time the flagship fused path: driver-side LPT file-task
    # planning + manifest resolution from parquet footers, executors stream
    # parquet -> Arrow -> numpy kernels with no JVM row materialization
    # (see xml2arrow_spark/sources/files.py for why this beats a row-fed
    # mapInArrow by ~20-30x).
    input_dir = tempfile.mkdtemp(prefix="bench_tokens_in_")
    zstd_dir = tempfile.mkdtemp(prefix="bench_zstd_")
    try:
        tokens_dataframe(
            spark, ENCODE_ROWS, variant="uniform_vocab", n_partitions=CPUS * 4
        ).write.mode("overwrite").parquet(input_dir)
        tok_in = spark.read.parquet(input_dir)
        # q1: encode work only (kernels produce the bytes; results dropped in
        # the task, metadata out) — the reference's own benchmark discipline
        # (parse to RecordBatches, discard: benches/parse_benchmark.rs).
        agg = best_of(
            "q1_encode_tokens",
            lambda: encode_parquet_stats(spark, input_dir, n_tasks=CPUS).agg(
                F.sum("n_values").alias("nv"),
                F.sum("in_bytes").alias("ib"),
                F.sum("out_bytes").alias("ob"),
                F.sum("n_rows").alias("nr"),
            ).collect()[0],
        )
        n_tokens = int(agg["nv"])
        extra["encode_rows"] = int(agg["nr"])
        extra["encode_values"] = n_tokens
        extra["encode_in_bytes"] = int(agg["ib"])
        extra["encode_out_bytes"] = int(agg["ob"])
        extra["encode_tokens_per_sec"] = round(n_tokens / queries["q1_encode_tokens"])

        # q1b: full store path — encode + per-unit sink write + lineage
        # manifest (what a production run does; includes the disk write).
        store_dir = tempfile.mkdtemp(prefix="bench_store_")
        try:
            # fresh store dir before each rep: a populated manifest would
            # turn rep 2 into a no-op resume
            best_of(
                "q1b_encode_store",
                lambda: encode_parquet_dataset(spark, input_dir, store_dir, n_tasks=CPUS),
                setup=lambda: shutil.rmtree(store_dir, ignore_errors=True),
            )
            extra["encode_store_tokens_per_sec"] = round(
                n_tokens / queries["q1b_encode_store"]
            )
            # q2: fused DECODE of the stored dataset (kernels + payload back
            # through Arrow) — the stage directly comparable to the
            # reference's parse throughput (BASELINE.md ~394 MiB/s: bytes ->
            # typed Arrow columns; here: encoded blocks -> typed Arrow
            # columns). The agg forces the token payload through the plan.
            from xml2arrow_spark.operators.dataset import decode_dataset

            best_of(
                "q2_decode_store",
                lambda: decode_dataset(spark, store_dir, n_tasks=CPUS)
                .agg(F.sum(F.size("tokens"))).collect(),
            )
            extra["decode_tokens_per_sec"] = round(
                n_tokens / queries["q2_decode_store"]
            )
        finally:
            shutil.rmtree(store_dir, ignore_errors=True)

        # reference-codec size baseline: parquet+zstd of the SAME table.
        # Timed OUTSIDE the headline wall: it measures the baseline codec,
        # not this engine — folding it in would mask engine regressions.
        with timed("parquet_zstd_baseline", baselines):
            tok_in.write.mode("overwrite").option("compression", "zstd").parquet(zstd_dir)
        zstd_bytes = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(zstd_dir) for f in fs if f.endswith(".parquet")
        )
    finally:
        shutil.rmtree(input_dir, ignore_errors=True)
        shutil.rmtree(zstd_dir, ignore_errors=True)
    extra["parquet_zstd_bytes"] = zstd_bytes
    extra["compression_ratio_vs_zstd_parquet"] = round(int(agg["ob"]) / zstd_bytes, 4)

    # -- q2b: codec selection across distributions (ratio vs parquet-zstd of
    # the same table; <1.0 = engine smaller). Two representative variants
    # (zipf = realistic token streams -> pdict; runny -> rle); ratios are
    # deterministic, so more variants only add wall-clock noise here — the
    # full matrix runs in tests/test_codecs.py.
    by_variant = {}
    by_variant_cascade = {}
    with timed("variant_compression_sweep", baselines):
        for variant in ["runny", "skewed_zipf"]:
            vdir = tempfile.mkdtemp(prefix=f"bench_v_{variant}_")
            zdir = tempfile.mkdtemp(prefix=f"bench_vz_{variant}_")
            try:
                tokens_dataframe(spark, 8000, variant=variant,
                                 n_partitions=16).write.mode("overwrite").parquet(vdir)
                spark.read.parquet(vdir).write.mode("overwrite").option(
                    "compression", "zstd").parquet(zdir)
                zb = sum(
                    os.path.getsize(os.path.join(r, f))
                    for r, _, fs in os.walk(zdir) for f in fs
                    if f.endswith(".parquet")
                )
                vagg = encode_parquet_stats(spark, vdir, n_tasks=16).agg(
                    F.sum("out_bytes").alias("ob")).collect()[0]
                by_variant[variant] = round(int(vagg["ob"]) / zb, 4)
                # the "+zstd" general-entropy cascade over the same table:
                # lightweight codecs expose structure, zstd squeezes the
                # residual entropy (applied per block only where it shrinks)
                vschema = spark.read.parquet(vdir).schema
                zman = CodecManifest.auto_for(vschema)
                for p in zman.columns.values():
                    p.codec = "auto+zstd"
                zagg = encode_parquet_stats(
                    spark, vdir, manifest=zman, n_tasks=16
                ).agg(F.sum("out_bytes").alias("ob")).collect()[0]
                by_variant_cascade[variant] = round(int(zagg["ob"]) / zb, 4)
            finally:
                shutil.rmtree(vdir, ignore_errors=True)
                shutil.rmtree(zdir, ignore_errors=True)
    extra["compression_vs_zstd_by_variant"] = by_variant
    extra["compression_vs_zstd_by_variant_cascade"] = by_variant_cascade

    # float-payload variant (r05): bf16-upcast float32 embeddings — the
    # dominant real-world float payload (mixed-precision training writes
    # bf16, pipelines upcast to float32, the bottom two mantissa bytes are
    # zero). byte-stream split (bss_float) + zstd vs plain+zstd vs
    # parquet-zstd on the same table; deterministic synthetic data (the
    # testdata embeddings are IID full-precision, where bss correctly does
    # not fire — the probe picks plain)
    with timed("embedding_compression_sweep", baselines):
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        rng = np.random.default_rng(17)
        n_vec, dim = 20000, 128
        flat = (
            rng.normal(size=n_vec * dim).astype(np.float32).view(np.uint32)
            & np.uint32(0xFFFF0000)
        ).view(np.float32)
        emb_tbl = pa.table(
            {
                "vec_id": pa.array(np.arange(n_vec, dtype=np.int64)),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(flat), dim
                ).cast(pa.list_(pa.float32())),
            }
        )
        edir = tempfile.mkdtemp(prefix="bench_emb_")
        ezdir = tempfile.mkdtemp(prefix="bench_embz_")
        try:
            pq.write_table(emb_tbl, os.path.join(edir, "part-0.parquet"))
            spark.read.parquet(edir).repartition(8).write.mode(
                "overwrite"
            ).option("compression", "zstd").parquet(ezdir)
            ezb = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(ezdir) for f in fs
                if f.endswith(".parquet")
            )
            eschema = spark.read.parquet(edir).schema
            emb_ratios = {}
            for name, codec in (
                ("plain_zstd", "plain_float+zstd"),
                ("bss_zstd", "bss_float+zstd"),
            ):
                eman = CodecManifest.auto_for(eschema)
                eman.columns["embedding"].codec = codec
                eagg = encode_parquet_stats(
                    spark, edir, manifest=eman, n_tasks=8
                ).agg(F.sum("out_bytes").alias("ob")).collect()[0]
                emb_ratios[name] = round(int(eagg["ob"]) / ezb, 4)
        finally:
            shutil.rmtree(edir, ignore_errors=True)
            shutil.rmtree(ezdir, ignore_errors=True)
    extra["bf16_embedding_vs_zstd"] = emb_ratios

    # almost-decimal float variant (r05 continuation): quality/score columns
    # are decimals in disguise with a sentinel sprinkle (NaN / true reals),
    # which knocks the all-or-nothing dec_float off the integer path for
    # EVERY block — alp_float's exception patching keeps it. auto vs
    # parquet-zstd of the same column (the engine's auto chain picks alp)
    with timed("dirty_decimal_sweep", baselines):
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        rng = np.random.default_rng(19)
        n_q = 400_000
        q = np.round(rng.uniform(0, 1000, n_q), 2)
        q[rng.choice(n_q, n_q // 100, replace=False)] = np.nan
        q[rng.choice(n_q, n_q // 200, replace=False)] = np.e
        q_tbl = pa.table({"score": pa.array(q)})  # the column under test, alone
        qdir = tempfile.mkdtemp(prefix="bench_alp_")
        qzdir = tempfile.mkdtemp(prefix="bench_alpz_")
        try:
            pq.write_table(q_tbl, os.path.join(qdir, "part-0.parquet"))
            spark.read.parquet(qdir).repartition(8).write.mode(
                "overwrite"
            ).option("compression", "zstd").parquet(qzdir)
            qzb = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(qzdir) for f in fs
                if f.endswith(".parquet")
            )
            qman = CodecManifest.auto_for(spark.read.parquet(qdir).schema)
            qagg = encode_parquet_stats(
                spark, qdir, manifest=qman, n_tasks=8
            ).agg(F.sum("out_bytes").alias("ob")).collect()[0]
            extra["dirty_decimal_vs_zstd"] = round(int(qagg["ob"]) / qzb, 4)
        finally:
            shutil.rmtree(qdir, ignore_errors=True)
            shutil.rmtree(qzdir, ignore_errors=True)

    # temporal variant (r05 session 4): event timestamps in ingest order —
    # sorted micros with jittered inter-arrivals, the universal crawl/event
    # shape. The engine's auto chain picks delta (+zstd squeezes the
    # near-constant residuals); parquet-zstd stores the same column from
    # its own encodings. Ratio <1 = engine smaller.
    with timed("event_ts_sweep", baselines):
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from xml2arrow_spark.manifest import ColumnPolicy

        rng = np.random.default_rng(23)
        n_t = 400_000
        gaps = rng.exponential(250_000, n_t).astype(np.int64) + 1  # ~4/s
        ts_col = 1_704_067_200_000_000 + np.cumsum(gaps)
        t_tbl = pa.table({
            "ts": pa.array(ts_col, type=pa.timestamp("us")),
        })
        tdir = tempfile.mkdtemp(prefix="bench_ts_")
        tzdir = tempfile.mkdtemp(prefix="bench_tsz_")
        try:
            pq.write_table(t_tbl, os.path.join(tdir, "part-0.parquet"))
            spark.read.parquet(tdir).repartition(8).write.mode(
                "overwrite"
            ).option("compression", "zstd").parquet(tzdir)
            tzb = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(tzdir) for f in fs
                if f.endswith(".parquet")
            )
            tman = CodecManifest(columns={"ts": ColumnPolicy(codec="auto+zstd")})
            tagg = encode_parquet_stats(
                spark, tdir, manifest=tman, n_tasks=8
            ).agg(F.sum("out_bytes").alias("ob")).collect()[0]
            extra["event_ts_vs_zstd"] = round(int(tagg["ob"]) / tzb, 4)
        finally:
            shutil.rmtree(tdir, ignore_errors=True)
            shutil.rmtree(tzdir, ignore_errors=True)

    # -- q3: documents tokenize -> encode -> decode -> verify ----------------
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def run_q3():
        t = tokenize_documents(docs)
        man = resolve_manifest(t, CodecManifest.auto_for(t.schema, block_rows=8192))
        decoded = decode_table(encode_table(t, man),
                               "doc_id string, tokens array<int>, n_tok int, source string")
        return decoded.count()

    extra["roundtrip_rows"] = best_of("q3_encode_roundtrip_docs", run_q3)

    # -- q4-q6: dedup ---------------------------------------------------------
    best_of("q4_dedup_exact", lambda: dedup.exact_dedup(docs).count())

    # the two-phase signature-table shape (sig_path) — the 100 TB plan: no
    # executor-storage cache; phase 1 writes the signature relation once,
    # phase 2 reads it for every band branch
    sig_dir = tempfile.mkdtemp(prefix="bench_sigs_")
    pairs = None

    def run_q5():
        nonlocal pairs
        pairs = dedup.lsh_near_dup_pairs(docs, sig_path=os.path.join(sig_dir, "sigs"))
        return pairs.count()

    try:
        extra["near_dup_pairs"] = best_of("q5_lsh_near_dup_pairs", run_q5)
        extra["near_dup_components"] = best_of(
            "q5c_near_dup_resolve",
            lambda: dedup.resolve_near_dups(pairs).select("label").distinct().count(),
        )
    finally:
        shutil.rmtree(sig_dir, ignore_errors=True)
    best_of(
        "q5b_minhash_fast",
        # vectorized fused-scan minhash (the 10^9-doc path; SQL twin is the
        # oracle) — force full evaluation via a signature-derived agg
        lambda: dedup.minhash_signatures_parquet(
            spark, f"{SF_DIR}/documents.parquet", n_tasks=CPUS
        ).agg(F.sum(F.element_at("sig", 1))).collect(),
    )
    best_of("q6_simhash_groups", lambda: dedup.simhash_groups(docs).count())

    # -- q7: text analysis ----------------------------------------------------
    def run_q7():
        textstats.lang_id(docs).groupBy("predicted_lang").count().collect()
        textstats.text_quality(docs).agg(F.sum("n_words")).collect()
        textstats.doc_fingerprint(docs).agg(F.count_distinct("fingerprint")).collect()

    best_of("q7_text_analysis", run_q7)

    # -- q8-q9: similarity ----------------------------------------------------
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    best_of("q8_cosine_topk", lambda: similarity.cosine_topk(emb, query_id=0, k=10).collect())
    best_of("q9_lsh_ann_topk", lambda: similarity.lsh_ann_topk(emb, query_id=0, k=5).collect())

    # -- q10: un-nesting linkage ----------------------------------------------
    best_of("q10_unnest_orders", lambda: entry.q_unnest_orders(spark, SF_DIR).count())

    # -- q11-q14: round-4 operators (VERDICT r04 #7: keep them regression-
    # visible in the headline) ------------------------------------------------

    def run_q11():
        # '+zstd' general-entropy cascade end-to-end (encode + decode)
        t = tokenize_documents(docs)
        man = CodecManifest.auto_for(t.schema, block_rows=8192)
        for p in man.columns.values():
            p.codec = "auto+zstd"
        man = resolve_manifest(t, man)
        return decode_table(
            encode_table(t, man),
            "doc_id string, tokens array<int>, n_tok int, source string",
        ).count()

    best_of("q11_cascade_roundtrip", run_q11)

    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    from xml2arrow_spark.pipeline import events as events_ops

    best_of(
        "q12_sessionize",
        lambda: events_ops.sessionize(events).count(),
    )
    # the stateful-streaming twin (applyInPandasWithState over staged
    # micro-batches); each rep stages + drains a fresh stream — the gap vs
    # q12 is the streaming-machinery overhead at this scale. Full BEST_OF
    # reps like every other query: this VM's 2-3x wall noise applies to
    # micro-batch scheduling too (n=1 samples are meaningless here — the
    # repo bench ground rule)
    best_of(
        "q12b_sessionize_stream",
        lambda: entry.q_streaming_sessionize(spark, SF_DIR).count(),
    )
    best_of("q13_tfidf_topk", lambda: entry.q_tfidf_topk(spark, SF_DIR).count())
    best_of(
        "q14_pack_sequences",
        lambda: entry.q_pack_sequences(spark, SF_DIR).count(),
    )

    # -- q15-q17: round-5 curation operators (regression-visible like the
    # round-4 set) ------------------------------------------------------------
    from xml2arrow_spark.pipeline.sampling import mixture_sample, shuffle_order

    def run_q15():
        # normalization + privacy + sub-document boilerplate passes over
        # the documents table
        textstats.normalize_text(docs).agg(F.sum("clean_len")).collect()
        textstats.pii_scrub(docs).agg(
            F.sum("n_email") + F.sum("n_ipv4") + F.sum("n_phone"),
            F.sum(F.length("scrubbed")),
        ).collect()
        textstats.paragraph_dedup(docs).agg(F.sum("n_kept")).collect()

    best_of("q15_pii_paragraph", run_q15)

    # two-phase window store (keys_path) — measured ~25% under the direct
    # shape at this sf: the frequency agg and the frequent-starts probe
    # read the materialized window relation instead of each recomputing
    # the O(n*k) key transform
    span_dir = tempfile.mkdtemp(prefix="bench_spanwin_")
    try:
        best_of(
            "q16_span_dedup",
            lambda: dedup.token_span_dedup(
                tokenize_documents(docs),
                keys_path=os.path.join(span_dir, "win"),
            ).agg(F.sum("n_kept")).collect(),
        )
    finally:
        shutil.rmtree(span_dir, ignore_errors=True)

    def run_q17():
        mixture_sample(docs, {"src0": 600, "src1": 300, "src2": 100}).count()
        shuffle_order(docs).agg(F.max("pos")).collect()

    best_of("q17_mixture_shuffle", run_q17)

    # -- q18: dataset maintenance (upsert + point lookup + family read) -------
    # Setup (untimed): encode the token table once, attach a quality family.
    # Per rep: merge a ~1% batch (replace-by-id — rep 1 inserts the new ids,
    # later reps replace them, so every rep rewrites the same affected-unit
    # set), point-look-up 16 ids, and decode base+family join. This is the
    # continuous-curation hot path: at 10^12 sequences its cost must track
    # the batch (affected units), not the corpus.
    from xml2arrow_spark.operators.checkpoint import (
        add_columns,
        encode_dataset,
        lookup_rows,
        read_encoded_dataset,
        upsert_rows,
    )

    maint_dir = tempfile.mkdtemp(prefix="bench_maint_")
    try:
        ds_path = os.path.join(maint_dir, "ds")
        tok_docs = tokenize_documents(docs).cache()
        # block_rows sized for SEVERAL blocks per unit — the 100 TB regime
        # (one block per unit would show zero block pruning by geometry,
        # not by defect)
        man_m = resolve_manifest(
            tok_docs, CodecManifest.auto_for(tok_docs.schema, block_rows=1024)
        )
        encode_dataset(tok_docs, ds_path, man_m, n_units=CPUS)
        add_columns(
            tok_docs.select(
                "doc_id", (F.col("n_tok") % F.lit(31)).cast("int").alias("q_score")
            ),
            ds_path,
            "quality",
        )
        # Bloom index on the id column (setup, untimed): q18b's lookups then
        # ride unit + zone + bloom pruning — the unclustered point-read
        # path — and q18a's upserts carry the index invalidate+rebuild as
        # part of their honest maintenance cost.
        from xml2arrow_spark.operators.bloomidx import build_bloom_index

        build_bloom_index(spark, ds_path, "doc_id")
        batch = (
            tok_docs.filter("doc_id LIKE '%77'")
            .withColumn("doc_id", F.concat("doc_id", F.lit("::m")))
        ).cache()
        batch.count()
        probe_ids = [r["doc_id"] for r in tok_docs.select("doc_id").limit(16).collect()]
        probe = spark.createDataFrame([(i,) for i in probe_ids], "doc_id string")

        # three separately-timed legs (one fused number hid which op moved)
        best_of("q18a_upsert_batch", lambda: upsert_rows(batch, ds_path))
        best_of(
            "q18b_point_lookup",
            lambda: lookup_rows(
                probe, ds_path, columns=["doc_id", "n_tok"]
            ).collect(),
        )
        best_of(
            "q18c_family_read",
            lambda: read_encoded_dataset(
                spark, ds_path, columns=["doc_id", "n_tok", "q_score"]
            ).agg(F.sum(F.coalesce("q_score", F.lit(0)))).collect(),
        )
        # deletion tiers, priced against each other on the SAME id batch:
        # q18d merge-on-read tombstone (O(batch) metadata write; later reps
        # append duplicate ids — harmless by contract) vs q18e the eager
        # delete (decode + re-encode every affected unit; rep 1 removes the
        # rows and folds the pending tombstones, later reps rewrite the
        # same units with zero deletions — the same unit-rewrite work)
        from xml2arrow_spark.operators.checkpoint import delete_rows
        from xml2arrow_spark.operators.tombstones import tombstone_rows

        del_ids = batch.select("doc_id").cache()
        del_ids.count()
        best_of("q18d_tombstone_batch", lambda: tombstone_rows(del_ids, ds_path))
        best_of("q18e_eager_delete", lambda: delete_rows(del_ids, ds_path))
        if queries.get("q18e_eager_delete"):
            extra["tombstone_vs_eager_delete"] = round(
                queries["q18d_tombstone_batch"] / queries["q18e_eager_delete"], 3
            )
        del_ids.unpersist()
        tok_docs.unpersist()
        batch.unpersist()
    finally:
        shutil.rmtree(maint_dir, ignore_errors=True)

    # q19: metadata-accelerated predicate aggregation (count_where) vs the
    # naive decode-everything path for the SAME answer. Setup (untimed):
    # range-clustered lineitem encoded with several blocks per file, so
    # interior/pruned classes exist by geometry (the 100 TB regime).
    from pyspark.sql.pandas.types import from_arrow_schema

    import pyarrow.parquet as pq_mod

    from xml2arrow_spark.operators.dataset import (
        count_where,
        decode_dataset,
        encode_parquet_dataset,
    )

    cw_dir = tempfile.mkdtemp(prefix="bench_cw_")
    try:
        cw_src = os.path.join(cw_dir, "src")
        cw_ds = os.path.join(cw_dir, "ds")
        li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).select(
            "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
        )
        li.repartitionByRange(8, "l_orderkey").sortWithinPartitions(
            "l_orderkey"
        ).write.mode("overwrite").parquet(cw_src)
        first = sorted(
            os.path.join(cw_src, f)
            for f in os.listdir(cw_src)
            if f.endswith(".parquet")
        )[0]
        man_cw = CodecManifest.auto_for(
            from_arrow_schema(pq_mod.read_schema(first)), block_rows=8192
        )
        encode_parquet_dataset(spark, cw_src, cw_ds, manifest=man_cw)
        okey_hi = li.agg(F.max("l_orderkey")).collect()[0][0] // 3
        pred = ("l_orderkey", 1000, int(okey_hi))

        best_of(
            "q19a_count_where_meta",
            lambda: count_where(
                spark, cw_ds, pred, agg_col="l_linenumber"
            ).collect(),
        )
        best_of(
            "q19b_agg_via_decode",
            # the FAIR baseline: column-pruned decode (what a careful user
            # without aggregate pushdown would run), not a full-table read
            lambda: decode_dataset(
                spark, cw_ds, columns=["l_orderkey", "l_linenumber"]
            )
            .filter(
                (F.col("l_orderkey") >= pred[1]) & (F.col("l_orderkey") <= pred[2])
            )
            .agg(F.count("*"), F.sum("l_linenumber"))
            .collect(),
        )
        extra["count_where_speedup"] = round(
            queries["q19b_agg_via_decode"] / queries["q19a_count_where_meta"], 2
        )

        # q19c/q19d: selective ROW retrieval of the same slice — the
        # in-kernel range selection (zone prune + filter-column-first
        # gather) vs the decode-everything-then-filter baseline. Both
        # return identical rows; the delta is payload that never decodes.
        best_of(
            "q19c_selective_scan_kernel",
            lambda: decode_dataset(
                spark, cw_ds,
                zone_filter=("l_orderkey", pred[1], pred[2]),
                row_filter=("l_orderkey", pred[1], pred[2]),
            ).count(),
        )
        best_of(
            "q19d_selective_scan_postfilter",
            lambda: decode_dataset(spark, cw_ds)
            .filter(
                (F.col("l_orderkey") >= pred[1]) & (F.col("l_orderkey") <= pred[2])
            )
            .count(),
        )
        extra["selective_scan_speedup"] = round(
            queries["q19d_selective_scan_postfilter"]
            / queries["q19c_selective_scan_kernel"],
            2,
        )

        # q19e/q19f: string-predicate count over a column the clustering
        # does NOT cover (l_returnflag; zone maps keep every block, so
        # every block is boundary) — the codec-aware mask path evaluates
        # the predicate on each block's dict_str DICTIONARY and code
        # stream without materializing a single string, vs the fair
        # column-pruned decode-then-filter baseline for the same answer.
        best_of(
            "q19e_count_where_str",
            lambda: count_where(spark, cw_ds, ("l_returnflag", "R", "R")),
        )
        best_of(
            "q19f_count_str_via_decode",
            lambda: decode_dataset(spark, cw_ds, columns=["l_returnflag"])
            .filter(F.col("l_returnflag") == "R")
            .count(),
        )
        extra["string_count_speedup"] = round(
            queries["q19f_count_str_via_decode"] / queries["q19e_count_where_str"], 2
        )

        # q19g/q19h: exact GROUP BY counts on the codec streams
        # (dict_str code-stream bincount per block, KB-scale partial-tally
        # shuffle) vs the fair column-pruned decode + Spark groupBy for
        # the same answer.
        from xml2arrow_spark.operators.dataset import group_count

        best_of(
            "q19g_group_count_codec",
            lambda: group_count(spark, cw_ds, "l_returnflag").collect(),
        )
        best_of(
            "q19h_group_count_via_decode",
            lambda: decode_dataset(spark, cw_ds, columns=["l_returnflag"])
            .groupBy("l_returnflag")
            .count()
            .collect(),
        )
        extra["group_count_speedup"] = round(
            queries["q19h_group_count_via_decode"]
            / queries["q19g_group_count_codec"],
            2,
        )

        # q19i/q19j: grouped SUM pushdown (key codes from the codec
        # streams, agg column decoded once per block, exact hi/lo fold)
        # vs the fair column-pruned decode + Spark groupBy.agg baseline.
        from xml2arrow_spark.operators.dataset import group_sum

        best_of(
            "q19i_group_sum_codec",
            lambda: group_sum(
                spark, cw_ds, "l_returnflag", "l_orderkey"
            ).collect(),
        )
        best_of(
            "q19j_group_sum_via_decode",
            lambda: decode_dataset(
                spark, cw_ds, columns=["l_returnflag", "l_orderkey"]
            )
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.count("l_orderkey").alias("n_nonnull"),
                F.sum("l_orderkey").alias("sum_a"),
            )
            .collect(),
        )
        extra["group_sum_speedup"] = round(
            queries["q19j_group_sum_via_decode"]
            / queries["q19i_group_sum_codec"],
            2,
        )

        # q19k: the same grouped aggregate over a KEY-CLUSTERED encode —
        # every block is single-valued in l_returnflag, so group_sum
        # answers from zone metadata (n_rows/zsum_i/extrema) without
        # touching payload bytes (setup untimed; compare to q19i for the
        # clustered-vs-unclustered gap and to q19j for the full decode).
        cw_src2 = os.path.join(cw_dir, "src_presort")
        cw_ds2 = os.path.join(cw_dir, "ds_presort")
        li.repartitionByRange(8, "l_returnflag", "l_orderkey").sortWithinPartitions(
            "l_returnflag", "l_orderkey"
        ).write.mode("overwrite").parquet(cw_src2)
        encode_parquet_dataset(spark, cw_src2, cw_ds2, manifest=man_cw)
        best_of(
            "q19k_group_sum_meta",
            lambda: group_sum(
                spark, cw_ds2, "l_returnflag", "l_orderkey"
            ).collect(),
        )
        extra["group_sum_meta_speedup"] = round(
            queries["q19j_group_sum_via_decode"]
            / queries["q19k_group_sum_meta"],
            2,
        )

        # q19l/q19m: the FILTERED grouped aggregate (group_sum(where=))
        # on the orderkey-clustered encode: ~2/3 of blocks prune on zone
        # bounds, provably-inside blocks skip the mask, only straddlers
        # feed the masked group kernel — vs the column-pruned decode +
        # WHERE + groupBy a careful user without pushdown would run.
        best_of(
            "q19l_group_sum_where",
            lambda: group_sum(
                spark, cw_ds, "l_returnflag", "l_linenumber", where=pred
            ).collect(),
        )
        best_of(
            "q19m_group_sum_where_via_decode",
            lambda: decode_dataset(
                spark, cw_ds,
                columns=["l_returnflag", "l_linenumber", "l_orderkey"],
            )
            .filter(
                (F.col("l_orderkey") >= pred[1])
                & (F.col("l_orderkey") <= pred[2])
            )
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.count("l_linenumber").alias("n_nonnull"),
                F.sum("l_linenumber").alias("sum_a"),
            )
            .collect(),
        )
        extra["group_sum_where_speedup"] = round(
            queries["q19m_group_sum_where_via_decode"]
            / queries["q19l_group_sum_where"],
            2,
        )

        # q19n/q19o: top-k pushdown (ORDER BY ... LIMIT) on the orderkey-
        # clustered encode: the tau pre-pass + rank-ordered block visits
        # read a handful of top blocks; the baseline is the column-pruned
        # decode + orderBy + limit a user without pushdown would run.
        from xml2arrow_spark.operators.dataset import top_k

        best_of(
            "q19n_top_k_meta",
            lambda: top_k(spark, cw_ds, "l_orderkey", 100).collect(),
        )
        best_of(
            "q19o_top_k_via_decode",
            lambda: decode_dataset(spark, cw_ds, columns=["l_orderkey"])
            .where(F.col("l_orderkey").isNotNull())
            .orderBy(F.desc("l_orderkey"))
            .limit(100)
            .collect(),
        )
        extra["top_k_speedup"] = round(
            queries["q19o_top_k_via_decode"] / queries["q19n_top_k_meta"], 2
        )

        # q19p/q19q: the SECOND clustered axis. cw_ds is range-clustered
        # on l_orderkey alone, so a l_quantity predicate decodes every
        # block; the z-ordered encode (Morton interleave of equi-depth
        # ranks, operators/zorder.py) gives l_quantity its own zone
        # locality and the same predicate prunes — identical exact count,
        # physically different layout (setup untimed).
        cw_src3 = os.path.join(cw_dir, "src_z")
        cw_ds3 = os.path.join(cw_dir, "ds_z")
        li.repartition(8).write.mode("overwrite").parquet(cw_src3)
        encode_parquet_dataset(
            spark, cw_src3, cw_ds3, manifest=man_cw,
            presort=["l_orderkey", "l_quantity"], cluster="zorder",
        )
        qpred = ("l_quantity", 5.0, 10.0)
        best_of(
            "q19p_count_where_2nd_axis_lex",
            lambda: count_where(
                spark, cw_ds, qpred, agg_col="l_orderkey"
            ).collect(),
        )
        best_of(
            "q19q_count_where_2nd_axis_zorder",
            lambda: count_where(
                spark, cw_ds3, qpred, agg_col="l_orderkey"
            ).collect(),
        )
        extra["zorder_2nd_axis_speedup"] = round(
            queries["q19p_count_where_2nd_axis_lex"]
            / queries["q19q_count_where_2nd_axis_zorder"],
            2,
        )

        # q19r/q19s: multi-agg GROUP BY — ONE pass over (key + 2 agg
        # streams) vs the two separate group_sum passes a user without
        # group_aggs would run (key codes decoded twice there).
        from xml2arrow_spark.operators.dataset import group_aggs

        best_of(
            "q19r_group_aggs_one_pass",
            lambda: group_aggs(
                spark, cw_ds, "l_returnflag", ["l_orderkey", "l_linenumber"]
            ).collect(),
        )
        best_of(
            "q19s_group_sum_twice",
            lambda: (
                group_sum(spark, cw_ds, "l_returnflag", "l_orderkey").collect(),
                group_sum(spark, cw_ds, "l_returnflag", "l_linenumber").collect(),
            ),
        )
        extra["group_aggs_one_pass_speedup"] = round(
            queries["q19s_group_sum_twice"] / queries["q19r_group_aggs_one_pass"],
            2,
        )
        extra["zorder_2nd_axis_pruned_frac"] = round(
            (lambda r: r["n_pruned"] / r["n_blocks"])(
                count_where(spark, cw_ds3, qpred).collect()[0].asDict()
            ),
            3,
        )

        # q19t/q19u: fixed-width time-bucket rollup on a TIME-clustered
        # encode (ingest order is time order — the events-table shape):
        # one-bucket blocks claim (bucket, count) from zone metadata, so
        # the daily-rollup query is mostly a stats scan; baseline is the
        # column-pruned decode + floor + groupBy a user without the
        # operator would run.
        from xml2arrow_spark.operators.dataset import time_bucket_count

        DAY30_US = 30 * 86_400_000_000
        cw_src4 = os.path.join(cw_dir, "src_time")
        cw_ds4 = os.path.join(cw_dir, "ds_time")
        li_t = spark.read.parquet(
            os.path.join(SF_DIR, "lineitem.parquet")
        ).select("l_shipdate", "l_orderkey")
        li_t.repartitionByRange(8, "l_shipdate").sortWithinPartitions(
            "l_shipdate"
        ).write.mode("overwrite").parquet(cw_src4)
        encode_parquet_dataset(spark, cw_src4, cw_ds4, layout="wide")
        best_of(
            "q19t_time_bucket_meta",
            lambda: time_bucket_count(
                spark, cw_ds4, "l_shipdate", DAY30_US
            ).collect(),
        )
        best_of(
            "q19u_time_bucket_via_decode",
            lambda: decode_dataset(spark, cw_ds4, columns=["l_shipdate"])
            .select(
                F.floor(
                    F.unix_micros(F.col("l_shipdate").cast("timestamp"))
                    / F.lit(DAY30_US)
                ).alias("bucket")
            )
            .groupBy("bucket")
            .count()
            .collect(),
        )
        extra["time_bucket_speedup"] = round(
            queries["q19u_time_bucket_via_decode"]
            / queries["q19t_time_bucket_meta"],
            2,
        )

        # q19v/q19w: DISJUNCTIVE predicate (any_of) — the NOT BETWEEN
        # shape over the clustered key: blocks inside neither disjunct
        # prune, blocks fully inside one claim count+sum from metadata;
        # baseline is the column-pruned decode + OR filter for the same
        # answer.
        from xml2arrow_spark.operators.dataset import any_of

        or_pred = any_of(
            ("l_orderkey", None, 1000), ("l_orderkey", int(okey_hi), None)
        )
        best_of(
            "q19v_count_where_or_meta",
            lambda: count_where(
                spark, cw_ds, or_pred, agg_col="l_linenumber"
            ).collect(),
        )
        best_of(
            "q19w_count_or_via_decode",
            lambda: decode_dataset(
                spark, cw_ds, columns=["l_orderkey", "l_linenumber"]
            )
            .filter(
                (F.col("l_orderkey") <= 1000)
                | (F.col("l_orderkey") >= int(okey_hi))
            )
            .agg(F.count("*"), F.sum("l_linenumber"))
            .collect(),
        )
        extra["count_where_or_speedup"] = round(
            queries["q19w_count_or_via_decode"]
            / queries["q19v_count_where_or_meta"],
            2,
        )

        # q19x/q19y: EXACT grouped COUNT(DISTINCT) on the codec streams
        # within an id window — the representative shape ("distinct X per
        # source in this slice"): the where= range composes with zone
        # pruning so non-overlapping blocks never read their pair streams;
        # the baseline is the decode + filter + countDistinct a user
        # without the operator would run. (Unfiltered, the operator is
        # roughly at par with the 32-way decode baseline on a narrow
        # low-cardinality column — its value is the pruning composition
        # and the max_pairs/no-silent-misreport contract.)
        from xml2arrow_spark.pipeline.sketches import group_distinct

        best_of(
            "q19x_group_distinct_codec",
            # default scale-adaptive dispatch (what a user runs): the
            # metadata-scale dataset answers driver-side, large ones fan out
            lambda: group_distinct(
                spark, cw_ds, "l_returnflag", "l_linenumber",
                where=pred,
            ).collect(),
        )
        best_of(
            "q19y_group_distinct_via_decode",
            lambda: decode_dataset(
                spark, cw_ds,
                columns=["l_returnflag", "l_linenumber", "l_orderkey"],
            )
            .filter(
                (F.col("l_orderkey") >= pred[1]) & (F.col("l_orderkey") <= pred[2])
            )
            .groupBy("l_returnflag")
            .agg(F.countDistinct("l_linenumber"))
            .collect(),
        )
        extra["group_distinct_speedup"] = round(
            queries["q19y_group_distinct_via_decode"]
            / queries["q19x_group_distinct_codec"],
            2,
        )

        # q20: training-shard export (pruned decode -> deterministic
        # shard+order -> partitioned sink -> verified manifest) vs the
        # bare decode+write a user without the manifest/order would run —
        # prices what the determinism + verification evidence costs.
        from xml2arrow_spark.operators.export import export_slice

        exp_dest = os.path.join(cw_dir, "export")
        best_of(
            "q20a_export_shards",
            lambda: export_slice(
                spark, cw_ds, exp_dest, id_col="l_orderkey",
                columns=["l_quantity"], n_shards=32, mode="overwrite",
            ),
        )
        raw_dest = os.path.join(cw_dir, "export_raw")
        best_of(
            "q20b_decode_write_raw",
            lambda: decode_dataset(
                spark, cw_ds, columns=["l_orderkey", "l_quantity"]
            ).write.mode("overwrite").parquet(raw_dest),
        )
        extra["export_overhead_x"] = round(
            queries["q20a_export_shards"] / queries["q20b_decode_write_raw"], 2
        )
    finally:
        shutil.rmtree(cw_dir, ignore_errors=True)

    total = round(sum(queries.values()), 3)
    # cross-round comparability: the r01-r04 headline covered q1-q10; the
    # r05 additions (q11-q17, incl. the machinery-dominated streaming
    # sessionize) widen coverage, so the same-query-set sum is reported
    # alongside the full total
    legacy = round(
        sum(
            v
            for k, v in queries.items()
            if not k.startswith(
                ("q11", "q12", "q13", "q14", "q15", "q16", "q17", "q18",
                 "q19", "q20")
            )
        ),
        3,
    )
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "value_13q_compat": legacy,
        "unit": "sec",
        "queries": queries,
        "bench_reps": BEST_OF,  # each query = min of this many in-JVM reps
        "query_runs": runs,  # every rep's wall time (variance evidence)
        "baseline_measurements": baselines,  # zstd/variant sweeps, not engine
        "sf": SF_DIR,
        "cpus": CPUS,
        **extra,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
