"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Every oracle here is rendered from the same dialect-neutral SQL templates
the Spark operators are built from (xml2arrow_spark/pipeline/sqlgen.py), so
Spark and DuckDB agree bit-for-bit — including float results, which are
sequential IEEE folds in both engines.

Every query returns CANONICALIZABLE columns only (scalars — no raw
array<...> outputs): the driver's canonicalizer sorts rows with pandas,
which cannot hash lists. Array-valued results (tokens, minhash signatures,
feature vectors) are therefore projected to deterministic scalar
fingerprints / per-element columns, with the identical expression in the
DuckDB oracle, so bit-identity still gates (a fold hash of the decoded
token array proves the round trip exactly as well as the raw array).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from xml2arrow_spark.manifest import CodecManifest
from xml2arrow_spark.operators.encode import decode_table, encode_table
from xml2arrow_spark.operators.partitioning import salt_skewed, with_work_bucket
from xml2arrow_spark.pipeline import (
    dedup,
    events as events_ops,
    multimodal,
    similarity,
    textstats,
)
from xml2arrow_spark.pipeline import sqlgen as G
from xml2arrow_spark.pipeline.oracles import all_oracles
from xml2arrow_spark.pipeline.textstats import FINGERPRINT_MOD
from xml2arrow_spark.plans.selector import resolve_manifest
from xml2arrow_spark.sources.tokens import tokenize_documents

TOKENS_DDL = "doc_id string, tokens array<int>, n_tok int, source string"

_SCRATCH_ROOT = None


def _scratch(prefix: str) -> str:
    """Per-process scratch dir for gate queries (sig tables, staged
    datasets, stream checkpoints), removed at interpreter exit — AFTER the
    driver has collected every returned DataFrame, so the files the lazy
    plans reference stay alive exactly as long as needed. Without this,
    every gate run leaked its scratch into /tmp (r03 review)."""
    global _SCRATCH_ROOT
    if _SCRATCH_ROOT is None:
        import atexit
        import shutil
        import tempfile

        _SCRATCH_ROOT = tempfile.mkdtemp(prefix="xml2arrow_gate_")
        atexit.register(shutil.rmtree, _SCRATCH_ROOT, ignore_errors=True)
    import tempfile

    return tempfile.mkdtemp(prefix=prefix, dir=_SCRATCH_ROOT)



def _token_scalar_projection(tok: DataFrame, *extra) -> DataFrame:
    """Canonicalizable projection of a token table: the array column becomes
    a base-31 fold fingerprint + min/max — bit-identical token arrays give
    bit-identical rows, and the driver's canonicalizer can sort them.
    ``extra`` columns (already aliased, null-free) are appended."""
    fp = F.expr(
        f"aggregate(tokens, CAST(0 AS BIGINT), "
        f"(acc, x) -> (acc * 31 + x) % {FINGERPRINT_MOD})"
    )
    return tok.select(
        "doc_id",
        "n_tok",
        "source",
        fp.alias("tok_fp"),
        # sentinel-coalesced: array_min/max of an empty token array is NULL,
        # and the driver gate's canonicalizer requires null-free output
        F.coalesce(F.array_min("tokens"), F.lit(-1)).alias("tok_min"),
        F.coalesce(F.array_max("tokens"), F.lit(-1)).alias("tok_max"),
        *extra,
    )


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


# -- engine core --------------------------------------------------------------


def q_tokenize(spark, sf_dir):
    return _token_scalar_projection(tokenize_documents(_docs(spark, sf_dir)))


def q_encode_roundtrip(spark, sf_dir):
    """Flagship: tokenize → codec auto-selection → encode → decode →
    scalar fingerprint; the fingerprint of the DECODED token arrays must
    match the oracle's fingerprint of independently recomputed tokens —
    bit-identity of the array<int32> round trip, in canonicalizable form."""
    tok = tokenize_documents(_docs(spark, sf_dir))
    manifest = resolve_manifest(tok, CodecManifest.auto_for(tok.schema, block_rows=4096))
    blocks = encode_table(tok, manifest)
    return _token_scalar_projection(decode_table(blocks, TOKENS_DDL))


def q_encode_cascade_roundtrip(spark, sf_dir):
    """The '+zstd' general-entropy cascade end-to-end: every column's
    lightweight codec payload is zstd-wrapped per block (only where it
    shrinks) and must decode bit-identically — same oracle as the plain
    roundtrip, because the cascade must be invisible to results."""
    tok = tokenize_documents(_docs(spark, sf_dir))
    man = CodecManifest.auto_for(tok.schema, block_rows=4096)
    for p in man.columns.values():
        p.codec = "auto+zstd"
    man = resolve_manifest(tok, man)
    blocks = encode_table(tok, man)
    return _token_scalar_projection(decode_table(blocks, TOKENS_DDL))


def q_encode_metadata(spark, sf_dir):
    """Per-(column, codec) value counts from the block lineage. The oracle
    recomputes each column's total value count from the raw data and pins
    the expected codec choice — layout-independent (byte counts vary with
    block boundaries; value counts do not). ALL FOUR columns are
    auto-selected (r05): the canonical-block costing in choose_str_codec
    makes the doc_id decision scale-invariant (fsst at every sf), so the
    r04 explicit manifest override is gone and this row now gates the auto
    choice itself at both parity scales."""
    tok = tokenize_documents(_docs(spark, sf_dir))
    base = CodecManifest.auto_for(tok.schema, block_rows=4096)
    manifest = resolve_manifest(tok, base)
    blocks = encode_table(tok, manifest)
    c = F.explode("cols").alias("c")
    kind = F.get_json_object("c.meta", "$.kind")
    nv = (
        F.when(kind == "list_int", F.get_json_object("c.meta", "$.values_meta.n"))
        .otherwise(F.get_json_object("c.meta", "$.n"))
        .cast("long")
    )
    return (
        blocks.select(c)
        .select(
            F.col("c.name").alias("name"),
            F.col("c.codec").alias("codec"),
            nv.alias("nv"),
        )
        .groupBy("name", "codec")
        .agg(F.sum("nv").alias("n_values"))
    )


def q_codec_selection(spark, sf_dir):
    """Resolved manifest as a table, THROUGH the YAML round trip: the
    resolved manifest is serialized to YAML and re-parsed before the rows
    are emitted — so this gate row also proves the config source/sink
    (S7/S8: ``Config::from_yaml_file``/``to_yaml_file`` analog,
    /root/reference/src/config.rs:267-300) and the bounded-sample early
    termination inside resolve_manifest (L1: one limit(sample_rows)
    collect, never a full scan). All columns are auto-selected — the r05
    scale-invariant selector removed the need for the r04 doc_id
    override — see q_encode_metadata."""
    tok = tokenize_documents(_docs(spark, sf_dir))
    base = CodecManifest.auto_for(tok.schema)
    manifest = resolve_manifest(tok, base)
    manifest = CodecManifest.from_yaml(manifest.to_yaml())  # S7/S8 round trip
    rows = [(c, p.codec) for c, p in sorted(manifest.columns.items())]
    return spark.createDataFrame(rows, "column string, codec string")


def q_token_stats(spark, sf_dir):
    """Per-source table stats, exact + sketched: the r05 ``n_vocab_est``
    leg is a KMV distinct-count sketch (pipeline/sketches.py) — portable
    integer arithmetic, so the oracle pins the ESTIMATE bit-for-bit (an
    HLL estimate would be engine-private)."""
    from xml2arrow_spark.pipeline.sketches import kmv_token_vocab

    tok = tokenize_documents(_docs(spark, sf_dir))
    stats = tok.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.min(F.array_min("tokens")).alias("min_token"),
        F.max(F.array_max("tokens")).alias("max_token"),
    )
    vocab = kmv_token_vocab(tok).withColumnRenamed("n_distinct_est", "n_vocab_est")
    return stats.join(vocab, "source", "left").withColumn(
        "n_vocab_est", F.coalesce("n_vocab_est", F.lit(0))
    )


def q_work_buckets(spark, sf_dir):
    tok = tokenize_documents(_docs(spark, sf_dir))
    return with_work_bucket(tok).groupBy("work_bucket").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("total_tokens")
    )


def q_salted_source_stats(spark, sf_dir):
    """Per-source stats through an EXPLICIT two-stage salted aggregation
    (north rule: salt skewed source partitions). Stage 1 partial-aggregates
    on (source, salt) — the skewed head key fans out over 8 salts — stage 2
    merges to the final per-source row. The oracle is the plain GROUP BY:
    salting must never change results."""
    tok = tokenize_documents(_docs(spark, sf_dir))
    salted = salt_skewed(tok, "source", skewed_values=["src0"], n_salts=8)
    partial = salted.groupBy("source", "salted_key").agg(
        F.count("*").alias("c"), F.sum("n_tok").alias("t")
    )
    return partial.groupBy("source").agg(
        F.sum("c").alias("n_docs"), F.sum("t").alias("total_tokens")
    )


# -- dedup --------------------------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    """Tagged union of the two EXACT dedup grains: record-level (md5
    hash-agg keep/copy table) and token-span (Lee-et-al-style substring
    pass over the token table — windows whose double-hash key appears in
    > max_df docs are dropped everywhere; the surviving sequence is
    pinned by the shared base-31 fold). Sentinels ('' / -1) keep the
    union null-free per the canonicalizer contract."""
    rd = dedup.exact_dedup(_docs(spark, sf_dir)).select(
        F.lit("record").alias("part"),
        F.col("text_md5").alias("key"),
        F.col("keep_doc_id").cast("string").alias("doc_id"),
        F.col("n_copies"),
        F.lit(-1).alias("n_tok"),
        F.lit(-1).alias("n_frequent_spans"),
        F.lit(-1).alias("n_kept"),
        F.lit(-1).cast("long").alias("kept_fp"),
    )
    sd = dedup.token_span_dedup(
        tokenize_documents(_docs(spark, sf_dir)), span=8, max_df=2
    ).select(
        F.lit("span").alias("part"),
        F.lit("").alias("key"),
        "doc_id",
        F.lit(-1).cast("long").alias("n_copies"),
        "n_tok",
        "n_frequent_spans",
        "n_kept",
        "kept_fp",
    )
    return rd.unionByName(sd)


def q_minhash_signatures(spark, sf_dir):
    """Vectorized minhash (mapInArrow + numpy — the 10^9-doc path; the SQL
    template is the oracle spec), signature unpacked to sig0..sig{K-1}
    scalar columns for the canonicalizer."""
    sigs = dedup.minhash_signatures_fast(_docs(spark, sf_dir))
    return sigs.select(
        "doc_id",
        *[F.element_at("sig", i + 1).alias(f"sig{i}") for i in range(G.MINHASH_K)],
        *[f"band{b}" for b in range(G.MINHASH_BANDS)],
    )


def q_lsh_near_dup_pairs(spark, sf_dir):
    """Gated through the TWO-PHASE signature table (``sig_path``) — the
    100 TB shape: no executor-storage cache; phase 1 writes the signature
    relation to parquet once, phase 2 reads it for every band branch and
    both verify-side payload joins. Values are identical to the persist
    shape (tools/check_parity.py runs both)."""
    import os

    return dedup.lsh_near_dup_pairs(
        _docs(spark, sf_dir), sig_path=os.path.join(_scratch("sigs_"), "sigs")
    )


def q_corpus_prep(spark, sf_dir):
    """The composed pipeline: quality gate → exact dedup → near-dup
    resolution → tokenize → encode → decode → fingerprint; one gate row
    proves the whole workflow plus codec bit-identity. The near-dup stage
    runs the two-phase signature table (the 100 TB shape)."""
    import os

    from xml2arrow_spark.pipeline.prep import corpus_prep

    return corpus_prep(
        _docs(spark, sf_dir), sig_path=os.path.join(_scratch("prepsigs_"), "sigs")
    )


def q_near_dup_resolve(spark, sf_dir):
    """Pairs → surviving set: connected components over the LSH near-dup
    pairs (min-label propagation); canonical_id is the kept doc. Pair
    generation runs the two-phase signature table (the 100 TB shape)."""
    import os

    pairs = dedup.lsh_near_dup_pairs(
        _docs(spark, sf_dir), sig_path=os.path.join(_scratch("resolvesigs_"), "sigs")
    )
    labels = dedup.resolve_near_dups(pairs)
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("canonical_id")
    )


def q_incremental_near_dup(spark, sf_dir):
    """Incremental dedup under the gate: the corpus is split 80/20 into an
    'old' batch (whose run persists the signature table) and a 'new' batch
    (which probes it via lsh_near_dup_pairs_incremental). The oracle is the
    FULL-corpus pair set restricted to pairs touching the new batch — the
    incremental contract: same pairs, without ever re-minhashing the old
    corpus or re-emitting its internal pairs."""
    import os

    docs = _docs(spark, sf_dir)
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    sig = os.path.join(_scratch("incsigs_"), "sigs")
    # phase 1 (the 'old' run): writing the signature table happens eagerly
    # inside lsh_near_dup_pairs when sig_path is given
    dedup.lsh_near_dup_pairs(old, sig_path=sig)
    return dedup.lsh_near_dup_pairs_incremental(new, sig)


def q_streaming_near_dup(spark, sf_dir):
    """Continuous near-dup detection: the corpus streams in THREE
    doc-id-range micro-batches, each probing + appending the incremental
    signature store; the union of all epochs' pairs must equal the batch
    full-corpus pair set (each pair is reported by exactly the micro-batch
    ingesting its later side) — same oracle as lsh_near_dup_pairs."""
    import os

    from xml2arrow_spark.streaming.neardup_stream import run_neardup_stream

    docs = _docs(spark, sf_dir)
    hi = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    from xml2arrow_spark.streaming.run import stage_ordered

    base = _scratch("sndup_")
    src = os.path.join(base, "src")
    out = os.path.join(base, "out")
    sig = os.path.join(base, "sigs")
    step = (hi + 2) // 3
    stage_ordered(  # explicit mtime stamps: replay order == range order
        [
            docs.filter(
                (F.col("doc_id") >= k * step)
                & (F.col("doc_id") < (k + 1) * step)
            )
            for k in range(3)
        ],
        src,
    )
    return run_neardup_stream(spark, src, out, sig, max_files_per_trigger=1)


def q_streaming_dedup(spark, sf_dir):
    """Streaming exact dedup (second custom stateful operator): the docs
    table replays as FOUR doc-id-range micro-batches written in range
    order (an ingest log replayed in order), the keyed seen-set emits
    each digest's first-arrival winner, and the surviving set must equal
    the batch min-id-per-text rule the oracle computes."""
    import os

    from xml2arrow_spark.streaming.dedup_stream import run_dedup_stream

    from xml2arrow_spark.streaming.run import stage_ordered

    docs = _docs(spark, sf_dir)
    hi = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    base = _scratch("sdedup_")
    src = os.path.join(base, "src")
    out = os.path.join(base, "out")
    step = (hi + 3) // 4
    stage_ordered(  # explicit mtime stamps: replay order == range order
        [
            docs.filter(
                (F.col("doc_id") >= k * step)
                & (F.col("doc_id") < (k + 1) * step)
            )
            for k in range(4)
        ],
        src,
    )
    return run_dedup_stream(spark, src, out, max_files_per_trigger=1)


def q_streaming_dedup_tiered(spark, sf_dir):
    """The r05 TIERED streaming dedup under the gate: same four-range
    ordered replay as q_streaming_dedup, but through the bounded-state
    operator — hot keyed state with an ingest-time TTL, first-arrivals
    folded per micro-batch into the persisted digest store, which keeps
    coverage exact across evictions. Tiering must be invisible to results:
    the oracle is the same batch min-id-per-text rule. A tiny TTL makes
    eviction REAL inside the drain, not just configured."""
    import os

    from xml2arrow_spark.streaming.dedup_stream import run_dedup_stream_tiered
    from xml2arrow_spark.streaming.run import stage_ordered

    docs = _docs(spark, sf_dir)
    hi = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    base = _scratch("sdeduptier_")
    src = os.path.join(base, "src")
    store = os.path.join(base, "store")
    step = (hi + 3) // 4
    stage_ordered(
        [
            docs.filter(
                (F.col("doc_id") >= k * step)
                & (F.col("doc_id") < (k + 1) * step)
            )
            for k in range(4)
        ],
        src,
    )
    return run_dedup_stream_tiered(
        spark, src, store, max_files_per_trigger=1, ttl_ms=1
    )


def q_near_dup_resolve_reliable(spark, sf_dir):
    """Connected components through the RELIABLE checkpoint path (r05):
    every round's labels materialize to parquet with a committed marker
    (cluster-survivable, resumable) instead of executor-local blocks.
    The storage mode must be invisible to results — same recursive-CTE
    oracle as near_dup_resolve."""
    import os

    base = _scratch("resolverel_")
    pairs = dedup.lsh_near_dup_pairs(
        _docs(spark, sf_dir), sig_path=os.path.join(base, "sigs")
    )
    labels = dedup.resolve_near_dups(
        pairs, checkpoint_dir=os.path.join(base, "cc")
    )
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("canonical_id")
    )


def q_contamination_hits(spark, sf_dir):
    """Benchmark decontamination under the gate: docs sharing >= 2
    distinct word-trigram shingles with the eval subset (doc_id % 97 == 0)
    — the pre-training leak check; eval shingles broadcast, one probe per
    corpus shingle."""
    docs = _docs(spark, sf_dir)
    eval_docs = docs.filter(F.col("doc_id") % 97 == 0)
    return dedup.contamination_hits(docs, eval_docs, min_overlap=2)


def q_dataset_wide_subset(spark, sf_dir):
    """Wide STORED dataset + subset decode + TRAINING-SHARD EXPORT: a
    lineitem projection goes through the fused sink with layout='wide',
    then only 2 of 4 columns leave through `export_slice` (storage-level
    column pruning -> deterministic shard sink -> verified manifest) and
    the gate returns the READ-BACK of the written shards — a row the
    export dropped, duplicated, or mis-sharded hash-mismatches the raw
    2-column oracle. verify_export must also hold."""
    import os

    from xml2arrow_spark.operators.dataset import encode_parquet_dataset
    from xml2arrow_spark.operators.export import (
        export_slice,
        read_export,
        verify_export,
    )

    base = _scratch("wds_")
    src = os.path.join(base, "src")
    out = os.path.join(base, "ds")
    exp = os.path.join(base, "export")
    _lineitem(spark, sf_dir).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    ).repartition(4).write.mode("overwrite").parquet(src)
    encode_parquet_dataset(spark, src, out, layout="wide")
    export_slice(
        spark, out, exp, id_col="l_orderkey", columns=["l_quantity"],
        n_shards=8, mode="overwrite",
    )
    rep = verify_export(spark, exp)
    if not rep["ok"]:
        raise AssertionError(f"export verification failed: {rep['findings']}")
    return read_export(spark, exp).select("l_orderkey", "l_quantity")


def q_dataset_compact_roundtrip(spark, sf_dir):
    """Maintenance rewrites under the driver gate. Leg 1 (compaction): a
    12-file encoded dataset is merged to <=3 generation-named compact
    files, then fused-decoded — compaction concatenates immutable blocks
    and must be invisible to results (was pytest-only in r3). Leg 2
    (reclustering, r05 session 6): the SAME ingest-ordered dataset is
    rewritten range-clustered on l_orderkey (decode -> globally sorted
    staging -> re-encode, the Iceberg rewrite_data_files(sort_order)
    analog) and fused-decoded — a rewrite that drops, duplicates, or
    mutates any row hash-mismatches. The oracle is the raw projection
    UNION ALL'd once per leg (row sets compare order-free)."""
    import os

    from xml2arrow_spark.operators.dataset import (
        compact_dataset,
        decode_dataset,
        encode_parquet_dataset,
        recluster_dataset,
    )

    base = _scratch("cds_")
    src = os.path.join(base, "src")
    out = os.path.join(base, "ds")
    rc = os.path.join(base, "rc")
    _lineitem(spark, sf_dir).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    ).repartition(12).write.mode("overwrite").parquet(src)
    encode_parquet_dataset(spark, src, out)
    recluster_dataset(spark, out, rc, presort=["l_orderkey"], n_files=4)
    compact_dataset(spark, out, target_files=3)
    return decode_dataset(spark, out).unionByName(decode_dataset(spark, rc))


def q_dataset_column_stats(spark, sf_dir):
    """Zone maps doubling as table statistics AND metadata-only aggregate
    pushdown (r05): exact per-column min/max, row count, non-null count,
    and integer SUM of a STORED dataset computed from per-block stats
    alone — no payload decode, no kernels; the oracle recomputes
    everything from the raw table, so a wrong or stale block stat
    hash-mismatches. Sentinels fill the inapplicable stats (int columns
    have no float pair; float columns push no sum — a metadata roll-up
    cannot reproduce a sequential float fold, and these stats never
    approximate).

    The ``where:`` legs gate :func:`count_where` — the metadata-
    accelerated predicate count: the source is range-clustered on
    l_orderkey, so the int leg exercises all three block classes
    (pruned / interior-from-metadata / boundary-decode), and the
    conjunction leg exercises the string + float decode path. The oracle
    recounts from the raw table, so a wrong interior claim, a stale null
    count, or an unsound truncated string bound all hash-mismatch.

    The ``group:`` legs gate :func:`group_count` (r05) — exact GROUP BY
    counts tallied on the codec streams (dict_str code-stream bincount for
    the string key, int code streams for l_linenumber) through the
    DISTRIBUTED mapInArrow path; the oracle re-groups the raw table, so a
    miscounted dictionary slot or a lost NULL group hash-mismatches.

    The ``gsum:`` legs gate :func:`group_sum` (r05) — grouped COUNT +
    exact SUM pushdown where key codes come from the codec streams and the
    agg column (l_orderkey) decodes once per block into a hi/lo-split
    python-int fold; the oracle re-aggregates the raw table, so a wrong
    per-group sum, a dropped NULL-agg row, or a miscounted group all
    hash-mismatch.

    The ``gcwhere:`` legs gate :func:`group_count` ``where=`` (r05
    continuation) — the filtered GROUP BY COUNT composing zone pruning,
    single-valued-key metadata claims, and codec-aware boundary masks with
    the masked count kernel; the oracle re-runs WHERE + GROUP BY on the
    raw table, so an unsound prune, a wrong key claim, or a mask/bincount
    misalignment all hash-mismatch.

    The ``gwhere:`` legs gate :func:`group_sum` ``where=`` (r05) — the
    filtered grouped aggregation composing zone pruning, interior claims,
    and codec-aware boundary masks before the group kernel: the int leg
    rides the range-clustered l_orderkey (all three block classes), the
    conjunction leg drives the string + float masked path on every block;
    the oracle re-runs WHERE + GROUP BY on the raw table, so an unsound
    prune, a wrong interior claim, or a mask/kernel misalignment all
    hash-mismatch."""
    import os

    from xml2arrow_spark.operators.dataset import (
        any_of,
        count_where,
        dataset_column_stats,
        encode_parquet_dataset,
        group_count,
        group_sum,
        time_bucket_count,
    )

    base = _scratch("stats_")
    src = os.path.join(base, "src")
    out = os.path.join(base, "ds")
    _lineitem(spark, sf_dir).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_returnflag", "l_shipdate"
    ).repartitionByRange(4, "l_orderkey").sortWithinPartitions(
        "l_orderkey"
    ).write.mode("overwrite").parquet(src)
    encode_parquet_dataset(spark, src, out)
    stats = dataset_column_stats(spark, out).select(
        "column",
        F.coalesce(F.col("vmin_i"), F.lit(-1)).alias("vmin_i"),
        F.coalesce(F.col("vmax_i"), F.lit(-1)).alias("vmax_i"),
        F.coalesce(F.col("vmin_d"), F.lit(-1.0)).alias("vmin_d"),
        F.coalesce(F.col("vmax_d"), F.lit(-1.0)).alias("vmax_d"),
        "n_unstated",
        "n_rows",
        "n_nonnull",
        F.coalesce(F.col("sum_i"), F.lit(-1)).alias("sum_i"),
    )

    def leg(label, predicate, agg_col=None):
        df = count_where(spark, out, predicate, agg_col=agg_col)
        return df.select(
            F.lit(label).alias("column"),
            # the predicate-MIN/MAX ride the extrema columns when an agg
            # column is requested (the oracle recomputes them with WHERE)
            (
                F.coalesce(F.col("n_min"), F.lit(-1)).cast("long")
                if agg_col is not None
                else F.lit(-1).cast("long")
            ).alias("vmin_i"),
            (
                F.coalesce(F.col("n_max"), F.lit(-1)).cast("long")
                if agg_col is not None
                else F.lit(-1).cast("long")
            ).alias("vmax_i"),
            F.lit(-1.0).alias("vmin_d"),
            F.lit(-1.0).alias("vmax_d"),
            F.lit(0).cast("long").alias("n_unstated"),
            F.col("n_match").alias("n_rows"),
            F.lit(-1).cast("long").alias("n_nonnull"),
            (
                F.coalesce(F.col("n_sum"), F.lit(-1)).cast("long")
                if agg_col is not None
                else F.lit(-1).cast("long")
            ).alias("sum_i"),
        )

    def gsum_leg(prefix, key, agg, where=None):
        gs = group_sum(spark, out, key, agg, local_bytes=0, where=where)
        return gs.select(
            F.concat(
                F.lit(prefix),
                F.coalesce(F.col(key).cast("string"), F.lit("<null>")),
            ).alias("column"),
            # per-group MIN/MAX pushdown rides the stats columns
            F.coalesce(F.col("min_a"), F.lit(-1)).cast("long").alias("vmin_i"),
            F.coalesce(F.col("max_a"), F.lit(-1)).cast("long").alias("vmax_i"),
            F.lit(-1.0).alias("vmin_d"),
            F.lit(-1.0).alias("vmax_d"),
            F.lit(0).cast("long").alias("n_unstated"),
            F.col("cnt").cast("long").alias("n_rows"),
            F.col("n_nonnull").cast("long").alias("n_nonnull"),
            F.coalesce(F.col("sum_a"), F.lit(-1)).cast("long").alias("sum_i"),
        )

    def _topk_sentinels(label_col, value_col):
        return [
            label_col.alias("column"),
            value_col.alias("vmin_i"),
            F.lit(-1).cast("long").alias("vmax_i"),
            F.lit(-1.0).alias("vmin_d"),
            F.lit(-1.0).alias("vmax_d"),
            F.lit(0).cast("long").alias("n_unstated"),
            F.lit(-1).cast("long").alias("n_rows"),
            F.lit(-1).cast("long").alias("n_nonnull"),
            F.lit(-1).cast("long").alias("sum_i"),
        ]

    def topk_int_leg(label, column, kk, descending, where=None):
        from xml2arrow_spark.operators.dataset import top_k

        tk = top_k(spark, out, column, kk, descending=descending,
                   local_bytes=0, where=where)
        return tk.select(*_topk_sentinels(
            F.lit(label), F.col(column).cast("long")
        ))

    def topk_str_leg(prefix, column, kk, descending):
        from xml2arrow_spark.operators.dataset import top_k

        tk = top_k(spark, out, column, kk, descending=descending,
                   local_bytes=0)
        return tk.select(*_topk_sentinels(
            F.concat(F.lit(prefix), F.col(column)),
            F.lit(-1).cast("long"),
        ))

    def topkrows_leg(label, column, kk, agg):
        # fingerprint the RANK() <= k row SET: min/max of the rank column
        # plus count + count/sum of a payload column — a wrong threshold,
        # a dropped tie, or an unsound zone/row filter all shift it
        from xml2arrow_spark.operators.dataset import top_k_rows

        df = top_k_rows(spark, out, column, kk, columns=[agg], local_bytes=0)
        return df.agg(
            F.min(column).cast("long").alias("vmin_i"),
            F.max(column).cast("long").alias("vmax_i"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count(agg).alias("n_nonnull"),
            F.sum(agg).cast("long").alias("sum_i"),
        ).select(
            F.lit(label).alias("column"),
            "vmin_i",
            "vmax_i",
            F.lit(-1.0).alias("vmin_d"),
            F.lit(-1.0).alias("vmax_d"),
            F.lit(0).cast("long").alias("n_unstated"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_nonnull").cast("long").alias("n_nonnull"),
            "sum_i",
        )

    def gaggs_legs(key, a1, a2):
        # ONE multi-agg pass (key codes + both agg streams decoded once,
        # sums AND sums of squares folded together), projected as label
        # rows so each (agg, statistic) gets its own oracle row — the
        # oracle re-aggregates each column separately (squares through
        # HUGEINT)
        from xml2arrow_spark.operators.dataset import group_aggs

        ga = group_aggs(spark, out, key, [a1, a2], local_bytes=0,
                        with_sum_sq=True)

        def leg(prefix, a):
            return ga.select(
                F.concat(
                    F.lit(prefix),
                    F.coalesce(F.col(key).cast("string"), F.lit("<null>")),
                ).alias("column"),
                F.coalesce(F.col(f"min_{a}"), F.lit(-1)).cast("long")
                .alias("vmin_i"),
                F.coalesce(F.col(f"max_{a}"), F.lit(-1)).cast("long")
                .alias("vmax_i"),
                F.lit(-1.0).alias("vmin_d"),
                F.lit(-1.0).alias("vmax_d"),
                F.lit(0).cast("long").alias("n_unstated"),
                F.col("cnt").cast("long").alias("n_rows"),
                F.col(f"nn_{a}").cast("long").alias("n_nonnull"),
                F.coalesce(F.col(f"sum_{a}"), F.lit(-1)).cast("long")
                .alias("sum_i"),
            )

        def ssq_leg(prefix, a):
            return ga.select(
                F.concat(
                    F.lit(prefix),
                    F.coalesce(F.col(key).cast("string"), F.lit("<null>")),
                ).alias("column"),
                F.coalesce(F.col(f"min_{a}"), F.lit(-1)).cast("long")
                .alias("vmin_i"),
                F.coalesce(F.col(f"max_{a}"), F.lit(-1)).cast("long")
                .alias("vmax_i"),
                F.lit(-1.0).alias("vmin_d"),
                F.lit(-1.0).alias("vmax_d"),
                F.lit(0).cast("long").alias("n_unstated"),
                F.col("cnt").cast("long").alias("n_rows"),
                F.col(f"nn_{a}").cast("long").alias("n_nonnull"),
                F.coalesce(F.col(f"sumsq_{a}"), F.lit(-1)).cast("long")
                .alias("sum_i"),
            )

        return (
            leg(f"gaggs:{a1}:", a1)
            .unionByName(leg(f"gaggs:{a2}:", a2))
            .unionByName(ssq_leg(f"gssq:{a1}:", a1))
            .unionByName(ssq_leg(f"gssq:{a2}:", a2))
        )

    def gc2_leg(prefix, k1, k2):
        # composite-key GROUP BY on the mixed-radix code stream; the
        # oracle re-groups the raw table on both keys
        gc = group_count(spark, out, [k1, k2], local_bytes=0)
        return gc.select(
            F.concat(
                F.lit(prefix),
                F.coalesce(F.col(k1).cast("string"), F.lit("<null>")),
                F.lit(","),
                F.coalesce(F.col(k2).cast("string"), F.lit("<null>")),
            ).alias("column"),
            F.lit(-1).cast("long").alias("vmin_i"),
            F.lit(-1).cast("long").alias("vmax_i"),
            F.lit(-1.0).alias("vmin_d"),
            F.lit(-1.0).alias("vmax_d"),
            F.lit(0).cast("long").alias("n_unstated"),
            F.col("cnt").cast("long").alias("n_rows"),
            F.lit(-1).cast("long").alias("n_nonnull"),
            F.lit(-1).cast("long").alias("sum_i"),
        )

    def ga2_leg(prefix, k1, k2, agg):
        # composite-key multi-agg pass; the oracle re-aggregates the raw
        # table grouped on both keys
        from xml2arrow_spark.operators.dataset import group_aggs

        ga = group_aggs(spark, out, [k1, k2], [agg], local_bytes=0)
        return ga.select(
            F.concat(
                F.lit(prefix),
                F.coalesce(F.col(k1).cast("string"), F.lit("<null>")),
                F.lit(","),
                F.coalesce(F.col(k2).cast("string"), F.lit("<null>")),
            ).alias("column"),
            F.coalesce(F.col(f"min_{agg}"), F.lit(-1)).cast("long")
            .alias("vmin_i"),
            F.coalesce(F.col(f"max_{agg}"), F.lit(-1)).cast("long")
            .alias("vmax_i"),
            F.lit(-1.0).alias("vmin_d"),
            F.lit(-1.0).alias("vmax_d"),
            F.lit(0).cast("long").alias("n_unstated"),
            F.col("cnt").cast("long").alias("n_rows"),
            F.col(f"nn_{agg}").cast("long").alias("n_nonnull"),
            F.coalesce(F.col(f"sum_{agg}"), F.lit(-1)).cast("long")
            .alias("sum_i"),
        )

    def gdx_leg(prefix, key, column):
        # exact per-group COUNT(DISTINCT) on the codec streams, through
        # the DISTRIBUTED pair roll-up
        from xml2arrow_spark.pipeline.sketches import group_distinct

        df = group_distinct(spark, out, key, column, local_bytes=0)
        return df.select(*_topk_sentinels(
            F.concat(
                F.lit(prefix),
                F.coalesce(F.col(key).cast("string"), F.lit("<null>")),
            ),
            F.col("n_distinct").cast("long"),
        ))

    def gkmv_leg(prefix, key, column, kk):
        # per-group KMV distinct estimate on the codec streams; the
        # PORTABLE hash makes the estimate itself oracle-pinnable
        from xml2arrow_spark.pipeline.sketches import group_distinct_est

        df = group_distinct_est(spark, out, key, column, k=kk, local_bytes=0)
        return df.select(*_topk_sentinels(
            F.concat(
                F.lit(prefix),
                F.coalesce(F.col(key).cast("string"), F.lit("<null>")),
            ),
            F.col("n_distinct_est").cast("long"),
        ))

    def quant_leg(prefix, column, qs, where=None):
        from xml2arrow_spark.operators.dataset import exact_quantiles

        df = exact_quantiles(spark, out, column, qs, local_bytes=0,
                             where=where)
        return df.select(*_topk_sentinels(
            F.concat(F.lit(prefix), F.col("q_milli").cast("string")),
            F.col("value").cast("long"),
        ))

    def hist_leg(prefix, column, nb, where=None):
        # exact equi-width histogram: one oracle row per NON-EMPTY bin,
        # the bucket expression recomputed in SQL with widened arithmetic
        from xml2arrow_spark.operators.dataset import value_histogram

        df = value_histogram(spark, out, column, nb, local_bytes=0,
                             where=where)
        return df.select(
            F.concat(F.lit(prefix), F.col("bin").cast("string"))
            .alias("column"),
            F.lit(-1).cast("long").alias("vmin_i"),
            F.lit(-1).cast("long").alias("vmax_i"),
            F.lit(-1.0).alias("vmin_d"),
            F.lit(-1.0).alias("vmax_d"),
            F.lit(0).cast("long").alias("n_unstated"),
            F.col("cnt").cast("long").alias("n_rows"),
            F.lit(-1).cast("long").alias("n_nonnull"),
            F.lit(-1).cast("long").alias("sum_i"),
        )

    def group_leg(prefix, column, where=None):
        gc = group_count(spark, out, column, local_bytes=0, where=where)
        return gc.select(
            F.concat(
                F.lit(prefix),
                F.coalesce(F.col(column).cast("string"), F.lit("<null>")),
            ).alias("column"),
            F.lit(-1).cast("long").alias("vmin_i"),
            F.lit(-1).cast("long").alias("vmax_i"),
            F.lit(-1.0).alias("vmin_d"),
            F.lit(-1.0).alias("vmax_d"),
            F.lit(0).cast("long").alias("n_unstated"),
            F.col("cnt").cast("long").alias("n_rows"),
            F.lit(-1).cast("long").alias("n_nonnull"),
            F.lit(-1).cast("long").alias("sum_i"),
        )

    return stats.unionByName(
        # null-free int predicate + SUM pushdown: interior blocks answer
        # from zone metadata (count AND sum), boundary blocks decode only
        # the two touched columns
        leg("where:okey", ("l_orderkey", 1000, 30000), agg_col="l_linenumber")
    ).unionByName(
        leg(
            "where:flag_qty",
            [("l_returnflag", "A", "N"), ("l_quantity", 5.0, 30.0)],
        )
    ).unionByName(
        # one-sided range: pruning/interior test only the bounded side
        leg("where:open", ("l_orderkey", 9000, None), agg_col="l_orderkey")
    ).unionByName(
        # temporal predicate (r05 #4): bounds are epoch-micros ticks, the
        # unit the timestamp's zone stats and mask kernel share — 1997..
        # 1998 window, SUM pushdown over the matched rows; the oracle
        # re-filters with the equivalent TIMESTAMP literals
        leg(
            "where:ship",
            ("l_shipdate", 852_076_800_000_000, 915_062_400_000_000),
            agg_col="l_orderkey",
        )
    ).unionByName(
        # fixed-width time-bucket rollup (r05 #4): 180-day buckets of
        # l_shipdate folded INSIDE the block walk — partials are
        # (bucket, count), never per-micros tallies; one-bucket blocks
        # claim from zone metadata. Oracle floor-divides the epoch-micros
        # (non-negative here, so DuckDB's truncating // equals floor).
        time_bucket_count(
            spark, out, "l_shipdate", 15_552_000_000_000, local_bytes=0
        ).select(
            F.concat(F.lit("tbucket:"), F.col("bucket").cast("string"))
            .alias("column"),
            F.col("bucket_start").alias("vmin_i"),
            F.lit(-1).cast("long").alias("vmax_i"),
            F.lit(-1.0).alias("vmin_d"),
            F.lit(-1.0).alias("vmax_d"),
            F.lit(0).cast("long").alias("n_unstated"),
            F.col("cnt").alias("n_rows"),
            F.lit(-1).cast("long").alias("n_nonnull"),
            F.lit(-1).cast("long").alias("sum_i"),
        )
    ).unionByName(
        # IN-list conjuncts (r05 continuation): the string set evaluates
        # once per dictionary value on the codec streams, the int set
        # composes with the SUM pushdown over the matched rows
        leg(
            "where:flag_in",
            [("l_returnflag", ["A", "R"]), ("l_linenumber", [1, 3, 5])],
            agg_col="l_orderkey",
        )
    ).unionByName(
        # DISJUNCTIVE predicate (r05 session 6): any_of closes the
        # predicate algebra under OR. The two one-sided ranges are the
        # NOT BETWEEN rewrite over the range-clustered key, so blocks
        # inside neither disjunct PRUNE, blocks fully inside one claim
        # interior (count AND sum from metadata), and the straddlers
        # fold OR'd masks; the oracle re-filters with SQL OR
        leg(
            "wor:okey",
            any_of(("l_orderkey", None, 5000), ("l_orderkey", 25000, None)),
            agg_col="l_linenumber",
        )
    ).unionByName(
        # ...and a mixed-category OR (string disjunct OR float disjunct):
        # floats never claim, so every surviving block drives the OR'd
        # codec-aware mask path
        leg(
            "wor:mixed",
            any_of(("l_returnflag", "A", "A"), ("l_quantity", None, 10.0)),
        )
    ).unionByName(
        # ...and a TEMPORAL OR (two disjoint shipping seasons, bounds as
        # epoch-micros ticks — the storage unit the zone stats share):
        # blocks between the windows prune, windows claim interior, the
        # oracle re-filters with TIMESTAMP literals under SQL OR
        leg(
            "wor:ship",
            any_of(
                ("l_shipdate", 788_918_400_000_000, 820_454_400_000_000),
                ("l_shipdate", 883_612_800_000_000, 915_148_800_000_000),
            ),
            agg_col="l_orderkey",
        )
    ).unionByName(
        # codec-stream GROUP BY counts: dict_str bincount (string key)
        group_leg("group:flag=", "l_returnflag")
    ).unionByName(
        # ...and the int code-stream path (dict/rle/pdict per block)
        group_leg("group:line=", "l_linenumber")
    ).unionByName(
        # grouped SUM pushdown (r05): key codes from the dict_str stream,
        # l_orderkey decodes once per block, exact hi/lo-split fold
        gsum_leg("gsum:flag=", "l_returnflag", "l_orderkey")
    ).unionByName(
        # ...and per-row int key codes (dict/rle per block)
        gsum_leg("gsum:line=", "l_linenumber", "l_orderkey")
    ).unionByName(
        # filtered grouped aggregation (r05 continuation): zone pruning +
        # interior claims + codec-aware boundary masks compose under a
        # GROUP BY — the source is range-clustered on l_orderkey, so the
        # predicate exercises all three block classes before the group
        # kernel ever runs
        gsum_leg(
            "gwhere:flag=", "l_returnflag", "l_linenumber",
            where=("l_orderkey", 1000, 30000),
        )
    ).unionByName(
        # ...and the string + float conjunction: every block straddles
        # (floats never claim interior), driving the masked group kernel
        gsum_leg(
            "gwhere:line=", "l_linenumber", "l_orderkey",
            where=[("l_returnflag", "A", "N"), ("l_quantity", 5.0, 30.0)],
        )
    ).unionByName(
        # filtered GROUP BY COUNT (r05 continuation): the same three block
        # classes compose with the masked count kernel — interior blocks
        # with a single-valued key claim (key, n_rows) from metadata alone
        group_leg(
            "gcwhere:flag=", "l_returnflag",
            where=("l_orderkey", 1000, 30000),
        )
    ).unionByName(
        # ...and the string + float conjunction (never-interior floats)
        # over an int key, driving the masked dict/rle count path
        group_leg(
            "gcwhere:line=", "l_linenumber",
            where=[("l_returnflag", "A", "N"), ("l_quantity", 5.0, 30.0)],
        )
    ).unionByName(
        # grouped aggregation under an IN-list (r05 continuation): the
        # point set rides the same codec-aware mask kernel under GROUP BY
        gsum_leg(
            "ginwhere:flag=", "l_returnflag", "l_orderkey",
            where=("l_linenumber", [1, 2, 4]),
        )
    ).unionByName(
        # grouped aggregation under OR (r05 session 6): the DNF
        # classifier composes with the masked group kernel — the
        # disjuncts straddle different block ranges of the clustered key
        gsum_leg(
            "gwor:flag=", "l_returnflag", "l_orderkey",
            where=any_of(
                ("l_orderkey", None, 5000), ("l_orderkey", 25000, None)
            ),
        )
    ).unionByName(
        # top-k pushdown (r05 continuation): ORDER BY ... LIMIT answered
        # zone-ordered with early termination through the distributed
        # path (tau pre-pass + per-file rank-ordered scans); the oracle
        # re-sorts the raw table, so a wrong skip, a lost duplicate, or
        # a NULL leaking into the ranks all hash-mismatch
        topk_int_leg("topk:okey", "l_orderkey", 7, descending=True)
    ).unionByName(
        topk_int_leg("topk:line", "l_linenumber", 5, descending=False)
    ).unionByName(
        topk_str_leg("topk:flag=", "l_returnflag", 6, descending=True)
    ).unionByName(
        # top-k ROW retrieval (RANK() <= k, ties included): the threshold
        # from the zone-ordered top_k feeds the selective decode (zone
        # prune + in-kernel range select); the oracle re-ranks the raw
        # table with a window function
        topkrows_leg("topkrows:okey", "l_orderkey", 50, "l_linenumber")
    ).unionByName(
        # exact discrete quantiles on the codec streams (integer milli-
        # quantile ranks, ceil division — bit-portable); the oracle
        # recomputes each rank with a cumulative window over the raw
        # table, so a miscounted tally or an off-by-one rank mismatches
        quant_leg("quant:okey=", "l_orderkey", [0, 250, 500, 750, 1000])
    ).unionByName(
        # multi-agg GROUP BY (group_aggs): both aggregate columns computed
        # in ONE pass (shared key codes), each gated by its own oracle row
        gaggs_legs("l_returnflag", "l_orderkey", "l_linenumber")
    ).unionByName(
        # filtered rank query (top_k(where=)): zone pruning + codec-aware
        # boundary masks compose with the rank walk; the oracle re-sorts
        # the filtered raw table
        topk_int_leg(
            "topkw:okey", "l_orderkey", 9, descending=True,
            where=[("l_returnflag", "A", "N"), ("l_linenumber", [1, 2])],
        )
    ).unionByName(
        # exact equi-width histogram on the codec streams (integer bucket
        # math, non-negative numerator — floor == trunc on both engines)
        hist_leg("hist:okey=", "l_orderkey", 8)
    ).unionByName(
        # filtered quantiles: the ranked population rides
        # group_count(where=)'s classification
        quant_leg(
            "quantw:line=", "l_linenumber", [0, 500, 1000],
            where=("l_returnflag", ["A", "R"]),
        )
    ).unionByName(
        # grouped distinct-count ESTIMATE (KMV, k=64): the oracle
        # reproduces the portable hash + k-min window + integer estimate
        # bit-for-bit — an approximation a gate can still pin exactly
        gkmv_leg("gkmv:flag=", "l_returnflag", "l_orderkey", 64)
    ).unionByName(
        # EXACT grouped COUNT(DISTINCT) on the codec streams (r05 session
        # 6): per-block distinct (group, value) pairs are the map-side
        # combine, the roll-up shuffles distinct pairs only; the oracle
        # recomputes count(DISTINCT) from the raw table
        gdx_leg("gdx:flag=", "l_returnflag", "l_linenumber")
    ).unionByName(
        # composite-key GROUP BY COUNT (r05 continuation): one mixed-radix
        # code stream per block, never a per-row tuple build
        gc2_leg("gc2:", "l_returnflag", "l_linenumber")
    ).unionByName(
        # ...and the composite-key grouped aggregate (one pass, tuple keys)
        ga2_leg("ga2:", "l_returnflag", "l_linenumber", "l_orderkey")
    )


def q_stratified_sample(spark, sf_dir):
    """Deterministic per-stratum sampling on the portable hash bucket —
    reproducible across engines/runs/cluster sizes (a rand(seed) sample
    never is); the oracle reproduces the selection bit-for-bit."""
    from xml2arrow_spark.pipeline.sampling import stratified_sample

    return stratified_sample(
        _docs(spark, sf_dir),
        {"src0": 500, "src1": 200, "src2": 1000},
        default_milli=100,
    ).select("doc_id", "source", "n_chars")


def q_deterministic_split(spark, sf_dir):
    """Stable train/val/test assignment by hash-bucket ranges: every row
    lands in exactly one split and never migrates between runs."""
    from xml2arrow_spark.pipeline.sampling import deterministic_split

    return deterministic_split(
        _docs(spark, sf_dir), {"train": 800, "val": 100, "test": 100}
    ).select("doc_id", "source", "split")


def q_cosine_topk_batch(spark, sf_dir):
    """Batch exact ANN: top-k for FOUR query vectors in one corpus pass
    (broadcast query set + per-query window) — the exact verifier the
    LSH/IVF candidate generators compose with at scale."""
    return similarity.cosine_topk_batch(
        _emb(spark, sf_dir), query_ids=[0, 1, 2, 3], k=5
    )


def q_neighbor_jaccard(spark, sf_dir):
    return dedup.neighbor_jaccard(_docs(spark, sf_dir))


# -- text analysis -------------------------------------------------------------
# (the per-operator simhash/lang_id/quality/counts/ngrams/fingerprint
# wrappers were removed with the r05 registry consolidation — the
# composites q_text_analysis / q_simhash_full call the pipeline functions
# directly, and keeping dead one-line twins here invited drift)


def q_quality_filter(spark, sf_dir):
    return textstats.quality_filter(_docs(spark, sf_dir))


def q_pii_scrub(spark, sf_dir):
    """Tagged union of the two text-scrubbing passes, each over
    deterministically DERIVED dirty text (the corpus itself is clean, so
    planting from doc_id + text is what makes the gate prove anything):
    PII redaction (email/phone/ipv4 planted, scrubbed to typed tokens,
    counted) and control/whitespace NORMALIZATION (per-row control chars
    + tab/CR/LF runs planted, stripped/collapsed/trimmed). The oracle
    derives the identical strings and applies the identical
    RE2-and-Java-compatible patterns — both outputs byte-for-byte.
    Sentinels (-1) keep the union null-free."""
    docs = _docs(spark, sf_dir)
    pii = docs.select(
        "doc_id",
        F.concat(
            F.lit("mail "),
            F.col("doc_id").cast("string"),
            F.lit("@ex.com tel 555-123-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" ip 10.1.2."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(" :: "),
            F.col("text"),
        ).alias("text"),
    )
    pl = textstats.pii_scrub(pii).select(
        F.lit("pii").alias("part"),
        "doc_id",
        F.col("scrubbed").alias("text_out"),
        F.col("n_email").alias("n_a"),
        F.col("n_ipv4").alias("n_b"),
        F.col("n_phone").alias("n_c"),
    )
    dirty = docs.select(
        "doc_id",
        F.concat(
            F.expr("chr(1 + doc_id % 7)"),
            F.lit("x\t\t"),
            F.col("text"),
            F.lit(" \r\n"),
            F.expr("chr(11)"),
            F.expr("chr(127)"),
        ).alias("text"),
    )
    nl = textstats.normalize_text(dirty).select(
        F.lit("norm").alias("part"),
        "doc_id",
        F.col("clean").alias("text_out"),
        F.col("n_control").alias("n_a"),
        F.col("clean_len").alias("n_b"),
        F.lit(-1).alias("n_c"),
    )
    return pl.unionByName(nl)


def q_tfidf_topk(spark, sf_dir):
    """Per-doc top-3 salient tokens by the integer tf-idf surrogate
    (tf*N*1000 div df) — rank/score/tie-break all exact integers, so the
    oracle reproduces the ranking bit-for-bit. N comes from the parquet
    footers (driver-side metadata), not a Spark count action."""
    import pyarrow.dataset as pads

    n = pads.dataset(f"{sf_dir}/documents.parquet").count_rows()
    return textstats.tfidf_topk(_docs(spark, sf_dir), k=3, expected_n=n)


def q_pack_sequences(spark, sf_dir):
    """Tagged union of the two context-window layout ops: GPT-style
    sequence PACKING (per-source running token offsets + fixed-budget bin
    spans from one window cumsum — the padding-free batch layout) and
    overlapping-stride CHUNKING (docs longer than the context split into
    max_len-token chunks stepping by stride; each chunk pinned by start/
    len and the shared base-31 fold). Sentinels ('' / -1) keep the union
    null-free per the canonicalizer contract."""
    tok = tokenize_documents(_docs(spark, sf_dir))
    pk = textstats.pack_sequences(
        tok.select("doc_id", "source", "n_tok"), budget_tokens=4096
    ).select(
        F.lit("pack").alias("part"),
        "doc_id",
        "source",
        "tok_offset",
        "bin_start",
        "bin_end",
        F.lit(-1).alias("chunk_id"),
        F.lit(-1).alias("chunk_start"),
        F.lit(-1).alias("chunk_len"),
        F.lit(-1).cast("long").alias("chunk_fp"),
    )
    ck = textstats.chunk_sequences(tok, max_len=48, stride=32).select(
        F.lit("chunk").alias("part"),
        "doc_id",
        F.lit("").alias("source"),
        F.lit(-1).cast("long").alias("tok_offset"),
        F.lit(-1).cast("long").alias("bin_start"),
        F.lit(-1).cast("long").alias("bin_end"),
        "chunk_id",
        "chunk_start",
        "chunk_len",
        "chunk_fp",
    )
    return pk.unionByName(ck)


# -- similarity ----------------------------------------------------------------


def q_cosine_topk(spark, sf_dir):
    return similarity.cosine_topk(_emb(spark, sf_dir), query_id=0, k=10)


def q_lsh_ann_topk(spark, sf_dir):
    """``n_rows`` pinned to the oracle's static geometry (ANN_ROWS) so both
    sides agree at ANY sf the parity harness runs at; the operator API
    itself defaults to size-derived geometry (ADVICE r02)."""
    from xml2arrow_spark.pipeline.oracles import ANN_ROWS

    return similarity.lsh_ann_topk(
        _emb(spark, sf_dir), query_id=0, k=5, n_rows=ANN_ROWS
    )


def q_ivf_ann_topk(spark, sf_dir):
    """IVF ANN: integer-exact k-means codebook (distributed training whose
    integer sums make the result order-independent, hence oracle-checkable)
    + nprobe-nearest-cells probe + exact cosine."""
    return similarity.ivf_ann_topk(_emb(spark, sf_dir), query_id=0, k=5)


def q_embedding_near_dup(spark, sf_dir):
    """Two-phase signature table (``sig_path``) + oracle-pinned geometry —
    see q_lsh_near_dup_pairs / q_lsh_ann_topk."""
    import os

    from xml2arrow_spark.pipeline.oracles import ANN_ROWS

    return similarity.embedding_near_dup(
        _emb(spark, sf_dir),
        threshold=0.3,
        n_rows=ANN_ROWS,
        sig_path=os.path.join(_scratch("embsigs_"), "sigs"),
    )


def q_parse_scalars(spark, sf_dir):
    """C1/C3 under the gate: the reference's 12-token case-insensitive
    boolean vocabulary (incl. on/off, which Spark's native boolean cast
    rejects) with full-ASCII-whitespace trim, strict (ANSI) integer
    parsing, and try-parse null mapping — all as Catalyst CASE/cast chains
    (functions.py; reference src/xml_parser.rs:158-182, 200-240)."""
    from xml2arrow_spark.functions import parse_boolean, parse_int

    li = _lineitem(spark, sf_dir)
    vocab = [" true", "FALSE", "Yes", "  no", "on\t", " OFF ", "T", "f",
             "Y", "n", "1", "0", "maybe", ""]
    idx = (
        F.pmod(F.col("l_orderkey") + F.col("l_linenumber"), F.lit(14)) + 1
    ).cast("int")
    btok = F.element_at(F.array(*[F.lit(v) for v in vocab]), idx)
    numstr = (F.col("l_orderkey") % 100000).cast("string")
    padded = F.concat(F.lit("  "), numstr, F.lit(" "))
    maybe_bad = F.when(
        (F.col("l_orderkey") + F.col("l_linenumber")) % 5 == 0,
        F.concat(numstr, F.lit("x")),
    ).otherwise(numstr)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # sentinels: non-vocabulary ('maybe', '') -> null -> -1
        F.coalesce(parse_boolean(btok).cast("int"), F.lit(-1)).alias("bool_flag"),
        parse_int(padded).alias("n_parsed"),  # strict ANSI cast, trimmed
        F.coalesce(parse_int(maybe_bad, strict=False), F.lit(-1)).alias("n_try"),
    )


# -- un-nesting / scalar transforms (reference parity: U1-U5, C2) ---------------


def q_unnest_orders(spark, sf_dir):
    """Parent-index/<level> linkage: each order's items with their dense
    0-based index in (l_linenumber, l_partkey, l_quantity) order (reference
    src/xml_parser.rs:472-489; SURVEY §2.4). r06: expressed as ONE window
    ``row_number`` over the same exchange the old collect_list shape paid —
    the groupBy+sort_array+posexplode round trip materialized every order's
    item array in the aggregation buffer just to tear it apart again
    (measured 1.86 s -> 0.18 s at sf1.0/local[32]; identical rows, since
    sort_array's lexicographic struct order IS the window's multi-column
    order, and equal structs are interchangeable)."""
    from pyspark.sql import Window

    li = _lineitem(spark, sf_dir)
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_partkey", "l_quantity"
    )
    return li.select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity"
    ).select(
        "l_orderkey",
        (F.row_number().over(w) - F.lit(1)).cast("int").alias("item_idx"),
        "l_linenumber",
        "l_partkey",
        "l_quantity",
    )


def q_sessionize(spark, sf_dir):
    """30-minute-gap sessionization over the events stream (window
    functions; exact integer arithmetic for the oracle)."""
    return events_ops.sessionize(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    )


def q_streaming_sessionize(spark, sf_dir):
    """Custom STATEFUL streaming operator under the gate: gap
    sessionization via applyInPandasWithState (buffered per-user state,
    watermark-proven session closure, EventTimeTimeout draining). The
    events table streams in micro-batches with a watermark delay covering
    its full span (so ANY arrival order is in-contract), a flush sentinel
    advances the final watermark, and the emitted sessions must equal the
    batch window-function sessionize — same oracle."""
    import datetime
    import os

    from xml2arrow_spark.streaming.sessionize_stream import (
        EVENTS_NARROW_DDL,
        FLUSH_EVENT_ID,
        run_sessionize_stream,
    )

    # guide §2.3 (project early), r06: stage ONLY the three columns the
    # operator reads — event_type/value otherwise ride the staging write,
    # the stream scan, the bucket shuffle and the Python boundary unused
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "ts", "user_id"
    )
    mm = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).collect()[0]
    span = int((mm["hi"] - mm["lo"]).total_seconds()) + 60
    sentinel_ts = mm["hi"] + datetime.timedelta(seconds=span + 1800 + 3600)
    base = _scratch("sess_")
    src = os.path.join(base, "src")
    out = os.path.join(base, "out")
    # r06 staging cost cuts (the operator under test is the STREAM, not the
    # staging): coalesce instead of repartitionByRange — the buffered-merge
    # contract holds under ANY file order (watermark covers the full span),
    # so the staged files need no time clustering and the range write's
    # sample pass + sort exchange bought nothing (measured 1.07 s -> 0.84 s);
    # coalesce(6) keeps the file count under maxFilesPerTrigger so the drain
    # stays one data batch. The one-row flush sentinel is a driver-side
    # pyarrow write (~1 ms) — the repo ground rule that KB-scale metadata
    # never goes through a Spark write job (the single-row RDD-backed
    # append measured 0.40 s); pa.timestamp("us") matches the source
    # files' physical type exactly.
    ev.coalesce(6).write.mode("overwrite").parquet(src)
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    sentinel_path = os.path.join(src, "part-sentinel-flush.parquet")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([FLUSH_EVENT_ID], pa.int64()),
                "ts": pa.array([sentinel_ts], pa.timestamp("us")),
                "user_id": pa.array([-1], pa.int64()),
            }
        ),
        sentinel_path,
    )
    # the sentinel must arrive LAST; stamp it firmly after the data files
    # (rapid writes can otherwise tie at mtime granularity)
    os.utime(sentinel_path, (time.time() + 60, time.time() + 60))
    # one data batch + the timeout batch: the operator's contract holds at
    # ANY trigger batching (the watermark covers the full span), and fewer
    # micro-batches is pure machinery savings — measured 10.3s -> 5.4s at
    # sf0.1 local[32] vs maxFilesPerTrigger=4, identical session rows. The
    # per-file-epoch shape stays covered by the mft=1 pytest pins.
    return run_sessionize_stream(
        spark, src, out, watermark_delay=f"{span} seconds",
        max_files_per_trigger=16, events_ddl=EVENTS_NARROW_DDL,
    )


def q_event_type_stats(spark, sf_dir):
    return events_ops.event_type_stats(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    )


def q_encode_nullable_roundtrip(spark, sf_dir):
    """Nullable boolean/double/bigint/string projection through the encode
    engine and back — exercises bool_pack + per-column validity sections
    (reference null contract: /root/reference/src/xml_parser.rs:158-182,
    327-338, 2645-2838)."""
    li = _lineitem(spark, sf_dir).select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") > F.lit(25.0), F.lit(True))
        .when(F.col("l_quantity") > F.lit(10.0), F.lit(False))
        .alias("heavy_flag"),
        F.when(F.col("l_discount") > F.lit(0.04), F.col("l_tax")).alias("tax_opt"),
        F.when(F.col("l_partkey") % 7 == 0, F.col("l_suppkey")).alias("supp_opt"),
        F.when(F.col("l_linenumber") >= 3, F.col("l_returnflag")).alias("flag_opt"),
    )
    manifest = CodecManifest.auto_for(li.schema, block_rows=8192)
    ddl = (
        "l_orderkey bigint, l_linenumber int, heavy_flag boolean, "
        "tax_opt double, supp_opt bigint, flag_opt string"
    )
    decoded = decode_table(encode_table(li, manifest), ddl)
    # nulls round-trip through the validity sections; the FINAL projection
    # maps them to sentinels so the output is null-free (None-vs-NaN
    # representation varies across pandas conversions — sentinels make the
    # null POSITIONS part of the value hash without that ambiguity)
    return decoded.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(F.col("heavy_flag").cast("int"), F.lit(-1)).alias("heavy_flag"),
        F.coalesce(F.col("tax_opt"), F.lit(-1.0)).alias("tax_opt"),
        F.coalesce(F.col("supp_opt"), F.lit(-1)).alias("supp_opt"),
        F.coalesce(F.col("flag_opt"), F.lit("<null>")).alias("flag_opt"),
    )


def q_encode_fused_roundtrip(spark, sf_dir):
    """The fused file-split path end-to-end under the driver gate: workers
    open the parquet splits with pyarrow and stream scan→encode with no JVM
    row boundary (sources/files.py), then decode back; the oracle is the
    raw table."""
    from xml2arrow_spark.operators.encode import encode_parquet

    blocks = encode_parquet(spark, f"{sf_dir}/lineitem.parquet", n_tasks=8)
    ddl = (
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string"
    )
    return decode_table(blocks, ddl)


def q_encode_typed_roundtrip(spark, sf_dir):
    """Mixed int/double/string projection of lineitem through the encode
    engine and back — floats are first-class (plain_float, bit-identical)."""
    cols = ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
            "l_returnflag", "l_linestatus"]
    df = _lineitem(spark, sf_dir).select(*cols)
    manifest = CodecManifest.auto_for(df.schema, block_rows=8192)
    ddl = ("l_orderkey bigint, l_linenumber int, l_quantity double, "
           "l_extendedprice double, l_returnflag string, l_linestatus string")
    return decode_table(encode_table(df, manifest), ddl)


def q_encode_presort_roundtrip(spark, sf_dir):
    """Presort RLE amplifier under the gate: rows are reordered WITHIN each
    task (no shuffle) by the low-cardinality flag columns before blocking —
    interleaved values become long runs — and decode returns them in the
    permuted order. The driver's value hash is order-insensitive, so the
    oracle is simply the raw projection: permutation must preserve the
    multiset exactly."""
    cols = ["l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus",
            "l_quantity"]
    df = _lineitem(spark, sf_dir).select(*cols)
    manifest = CodecManifest.auto_for(df.schema, block_rows=8192)
    blocks = encode_table(df, manifest, presort=["l_returnflag", "l_linestatus"])
    ddl = ("l_orderkey bigint, l_linenumber int, l_returnflag string, "
           "l_linestatus string, l_quantity double")
    return decode_table(blocks, ddl)


def q_encode_wide_subset(spark, sf_dir):
    """Wide blocks layout + decode-side column pruning: encode six lineitem
    columns as per-column top-level triples, decode only THREE — on a
    persisted table the parquet scan skips the other payloads entirely
    (pinned in tests/test_wide_layout.py)."""
    cols = ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
            "l_returnflag", "l_linestatus"]
    df = _lineitem(spark, sf_dir).select(*cols)
    manifest = CodecManifest.auto_for(df.schema, block_rows=8192)
    blocks = encode_table(df, manifest, layout="wide")
    return decode_table(blocks, "l_orderkey bigint, l_linenumber int, l_quantity double")


def q_encode_zonemap_scan(spark, sf_dir):
    """Selective scan, both pushdown levels: zone maps skip whole blocks
    before any kernel runs, then the IN-KERNEL range row-filter (the
    3-tuple form) gathers exactly the matching rows — no Spark-side
    post-filter remains, so a single wrongly-selected or dropped row
    hash-mismatches the oracle's plain filtered projection."""
    from xml2arrow_spark.operators.encode import encode_table as _enc

    cols = ["l_orderkey", "l_linenumber", "l_quantity"]
    df = _lineitem(spark, sf_dir).select(*cols)
    manifest = CodecManifest.auto_for(df.schema, block_rows=4096)
    blocks = _enc(df, manifest)
    return decode_table(
        blocks,
        "l_orderkey bigint, l_linenumber int, l_quantity double",
        zone_filter=("l_orderkey", 10000, 30000),
        row_filter=("l_orderkey", 10000, 30000),
    )


def q_encode_zonemap_multi(spark, sf_dir):
    """Conjunctive zone-map pruning with MIXED bound types: an integer
    range on l_orderkey AND a string range on l_returnflag (string zone
    stats are truncation-safe UTF-8 bounds). Blocks failing EITHER
    predicate are skipped before any kernel runs; the oracle is the plain
    doubly-filtered projection — pruning must be invisible to results."""
    from xml2arrow_spark.operators.encode import encode_table as _enc

    cols = ["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"]
    df = _lineitem(spark, sf_dir).select(*cols)
    manifest = CodecManifest.auto_for(df.schema, block_rows=4096)
    blocks = _enc(df, manifest)
    decoded = decode_table(
        blocks,
        "l_orderkey bigint, l_linenumber int, l_quantity double, "
        "l_returnflag string",
        zone_filter=[
            ("l_orderkey", 10000, 30000),
            ("l_returnflag", "A", "N"),
        ],
    )
    return decoded.filter(
        (F.col("l_orderkey") >= 10000)
        & (F.col("l_orderkey") <= 30000)
        & (F.col("l_returnflag") >= "A")
        & (F.col("l_returnflag") <= "N")
    )


def q_affine_transform(spark, sf_dir):
    """The reference's float affine transform value*scale + offset
    (src/xml_parser.rs:252-291) as a Catalyst expression."""
    return _lineitem(spark, sf_dir).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * F.lit(0.01) + F.lit(100.0)).alias("adjusted"),
    )


def q_encode_float32_roundtrip(spark, sf_dir):
    """Float32 through the encode engine and back — the reference's Float32
    primitive (/root/reference/src/config.rs:526-559). The decimal-probe
    codec (dec_float) now covers float32 too: the probe runs in float64 (an
    exact widening) and verifies against the float32 bits, so 2-decimal
    lineitem quantities store as small ints. Output widened to double on
    BOTH sides (exact, canonicalizer-friendly)."""
    df = _lineitem(spark, sf_dir).select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("float").alias("qty_f"),
        F.col("l_discount").cast("float").alias("disc_f"),
    )
    manifest = CodecManifest.auto_for(df.schema, block_rows=8192)
    ddl = "l_orderkey bigint, l_linenumber int, qty_f float, disc_f float"
    decoded = decode_table(encode_table(df, manifest), ddl)
    return decoded.select(
        "l_orderkey",
        "l_linenumber",
        F.col("qty_f").cast("double").alias("qty_f"),
        F.col("disc_f").cast("double").alias("disc_f"),
    )


def q_encode_uint64_roundtrip(spark, sf_dir):
    """UInt64's widened type Decimal(20,0) through the engine: values above
    int64's range (l_orderkey + 2^63) ride the integer-codec family as the
    low 64 bits of the decimal128 storage and decode back exactly —
    the reference's full-range contract for its 12th primitive
    (/root/reference/src/config.rs:544-559). Output as digit strings (the
    canonicalizer-portable form of a 20-digit value) on BOTH sides."""
    big = (
        F.col("l_orderkey").cast("decimal(20,0)")
        + F.lit("9223372036854775808").cast("decimal(20,0)")
    ).cast("decimal(20,0)")
    df = _lineitem(spark, sf_dir).select(
        "l_orderkey", "l_linenumber", big.alias("big_id")
    )
    manifest = CodecManifest.auto_for(df.schema, block_rows=8192)
    ddl = "l_orderkey bigint, l_linenumber int, big_id decimal(20,0)"
    decoded = decode_table(encode_table(df, manifest), ddl)
    return decoded.select(
        "l_orderkey",
        "l_linenumber",
        F.col("big_id").cast("string").alias("big_id_str"),
    )


def q_encode_embeddings_roundtrip(spark, sf_dir):
    """float-list columns through the encode engine: the embeddings table
    (array<float>) round-trips bit-identically — lengths FOR-packed,
    flattened values through the float codec family. The embedding column
    is pinned to ``bss_float+zstd`` (byte-stream split + entropy cascade,
    the Parquet BYTE_STREAM_SPLIT layout — r05) so the driver gate covers
    the cascade-stage float kernel; every other column stays auto (dec
    probe -> plain fallback). Decode is bit-identical either way, so the
    oracle is codec-agnostic. Canonical projection: dim + a sequential-fold
    double fingerprint + first/last elements (exact float32->double
    widenings), identical in the oracle."""
    emb = _emb(spark, sf_dir)
    base = CodecManifest.auto_for(emb.schema, block_rows=4096)
    base.columns["embedding"].codec = "bss_float+zstd"
    manifest = resolve_manifest(emb, base)
    decoded = decode_table(
        encode_table(emb, manifest), "vec_id bigint, embedding array<float>"
    )
    fold = F.expr(
        "aggregate(embedding, CAST(0.0 AS DOUBLE), "
        "(acc, x) -> acc / CAST(2.0 AS DOUBLE) + x)"
    )
    # sentinel discipline (gate rule: no output nulls): null/empty rows map
    # to -1/-999 on BOTH sides, and element_at is guarded against the
    # empty array (index 0 raises in Spark)
    nonempty = F.size("embedding") > 0
    return decoded.select(
        "vec_id",
        F.coalesce(F.size("embedding"), F.lit(-1)).alias("dim"),
        F.coalesce(fold, F.lit(-999.0)).alias("emb_fp"),
        F.when(nonempty, F.element_at("embedding", 1).cast("double"))
        .otherwise(F.lit(-999.0)).alias("e_first"),
        F.when(
            nonempty,
            F.element_at("embedding", F.size("embedding")).cast("double"),
        ).otherwise(F.lit(-999.0)).alias("e_last"),
    )


def q_encode_dataset_resume(spark, sf_dir):
    """Checkpoint/resume under the driver gate: encode_dataset runs TWICE
    into the same directory — call 1 restricted to half the unit ids
    (simulating a run killed partway: the other units are simply absent
    from the manifest), call 2 unrestricted, whose left-anti join against
    completed units encodes ONLY the missing half (re-encode-nothing is
    pinned by tests/test_checkpoint.py on manifest row counts). The decoded
    dataset must equal the raw oracle — resume is invisible to results.
    Further legs below exercise delete, upsert, column families,
    merge-on-read tombstones (pending at read time), snapshots, and
    Bloom-indexed point lookups over the same dataset.
    Reference analog: parser-reuse/state-isolation round trips
    (/root/reference/tests/integration_tests.rs:176-269)."""
    import os

    from xml2arrow_spark.operators.checkpoint import (
        encode_dataset,
        read_encoded_dataset,
    )

    tok = tokenize_documents(_docs(spark, sf_dir))
    man = resolve_manifest(tok, CodecManifest.auto_for(tok.schema, block_rows=4096))
    path = os.path.join(_scratch("ds_"), "ds")
    n_units = 8
    encode_dataset(tok, path, man, n_units=n_units, only_units=[0, 1, 2, 3])
    encode_dataset(tok, path, man, n_units=n_units)  # resume: encodes 4..7
    # r05 delete leg: row-level delete with unit-pruned re-encode (the
    # right-to-be-forgotten pass) — docs whose id ends in '7' are removed
    # from the COMPLETED dataset
    from xml2arrow_spark.operators.checkpoint import delete_rows, upsert_rows

    delete_rows(tok.filter("doc_id LIKE '%7'").select("doc_id"), path)
    # r05 snapshot leg: freeze the post-delete state as a zero-copy
    # snapshot; the upsert and family backfill below keep mutating the
    # live tree, and the 'snap' leg at the end must still read EXACTLY
    # the post-delete rows (time travel for reproducible training reads).
    from xml2arrow_spark.operators.snapshot import snapshot_dataset, snapshot_path

    snapshot_dataset(path, "post-delete")
    # r05 upsert leg (MERGE semantics, unit-pruned like the delete): docs
    # ending in '3' are REPLACED by 16-token truncations, docs ending in
    # '9' are re-INSERTED under a new id. The oracle states the final row
    # set directly, so resume, delete, and upsert must all be invisible
    # except for exactly these row edits.
    replaced = (
        tok.filter("doc_id LIKE '%3'")
        .withColumn("tokens", F.expr("slice(tokens, 1, 16)"))
        .withColumn("n_tok", F.expr("CAST(size(tokens) AS INT)"))
    )
    inserted = tok.filter("doc_id LIKE '%9'").withColumn(
        "doc_id", F.concat("doc_id", F.lit("::v2"))
    )
    upsert_rows(replaced.unionByName(inserted), path)
    # r05 column-family leg (schema evolution without rewriting): a quality
    # score is backfilled for docs ending in '1' ONLY — its own encoded
    # blocks tree, zero base bytes touched; the read path left-joins it, so
    # uncovered rows surface the -1 sentinel (the oracle's CASE arm)
    from xml2arrow_spark.operators.checkpoint import add_columns

    add_columns(
        tok.filter("doc_id LIKE '%1'").select(
            "doc_id", (F.col("n_tok") % F.lit(31)).cast("int").alias("q_score")
        ),
        path,
        "quality",
    )
    # r05 tombstone leg (merge-on-read soft delete): ids ending in '4' are
    # tombstoned — an O(batch) metadata write, zero payload bytes touched,
    # NOT folded before the reads below. The 'all' leg must hide them via
    # the read-side anti-join; the 'post-delete' snapshot was frozen BEFORE
    # this, so the 'snap' leg must still SHOW them (soft deletes are not
    # time travel) — leaking either way hash-mismatches the oracle.
    from xml2arrow_spark.operators.tombstones import tombstone_rows

    tombstone_rows(tok.filter("doc_id LIKE '%4'").select("doc_id"), path)
    # r05 bloom leg: point lookups through the per-block Bloom index built
    # AFTER the mutations above (its partitions were invalidated+rebuilt by
    # delete/upsert; this full build also covers the family tree's base).
    # The lookup batch (ids ending in '5' — untouched by every edit) flows
    # through unit pruning + zone maps + the bloom block filter; a filter
    # that wrongly drops a block surfaces here as missing oracle rows.
    from xml2arrow_spark.operators.bloomidx import build_bloom_index
    from xml2arrow_spark.operators.checkpoint import lookup_rows

    build_bloom_index(spark, path, "doc_id")
    looked = lookup_rows(
        tok.filter("doc_id LIKE '%5'").select("doc_id"), path
    )
    full = _token_scalar_projection(
        read_encoded_dataset(spark, path),
        F.coalesce("q_score", F.lit(-1)).alias("q_score"),
        F.lit("all").alias("leg"),
    )
    snap = _token_scalar_projection(
        read_encoded_dataset(spark, snapshot_path(path, "post-delete")),
        # the family was backfilled AFTER the freeze: a snapshot that
        # leaked it would be reading the future
        F.lit(-1).alias("q_score"),
        F.lit("snap").alias("leg"),
    )
    return full.unionByName(
        _token_scalar_projection(
            looked,
            F.coalesce("q_score", F.lit(-1)).alias("q_score"),
            F.lit("lookup").alias("leg"),
        )
    ).unionByName(snap)


def q_streaming_encode(spark, sf_dir):
    """Structured Streaming encode under the driver gate: the token table is
    staged as a parquet directory, drained by the availableNow foreachBatch
    stream (streaming/encode_stream.py) into encoded blocks across several
    micro-batches, then decoded back; the oracle is the raw token
    projection — streaming must be invisible to results."""
    import os

    from xml2arrow_spark.streaming.encode_stream import (
        encode_stream,
        run_stream_once,
    )

    base = _scratch("stream_")
    src = os.path.join(base, "src")
    out = os.path.join(base, "out")
    tok = tokenize_documents(_docs(spark, sf_dir))
    # several input files -> several micro-batches under maxFilesPerTrigger
    tok.repartition(16).write.mode("overwrite").parquet(src)
    man = CodecManifest.auto_for(tok.schema, block_rows=4096)
    run_stream_once(encode_stream(spark, src, out, man, schema_ddl=TOKENS_DDL))
    blocks = spark.read.parquet(os.path.join(out, "blocks"))
    return _token_scalar_projection(decode_table(blocks, TOKENS_DDL))


# -- multimodal ----------------------------------------------------------------


def q_multimodal_meta(spark, sf_dir):
    return multimodal.media_metadata(
        multimodal.attach_binary_payload(_docs(spark, sf_dir))
    )


def q_multimodal_frames(spark, sf_dir):
    """Frame sampling over the binary payload: one row per (doc, frame),
    stats computed vectorized over the flattened batch buffer; the
    frame_bytes column is dropped for the gate (binary cells are not
    canonicalizable) — frame_len + frame_sum pin the same windows."""
    return multimodal.sample_frames(
        multimodal.attach_binary_payload(_docs(spark, sf_dir))
    ).drop("frame_bytes")


def q_multimodal_features(spark, sf_dir):
    """Arrow-batched feature extraction with the deterministic fake decoder
    (real decoders stubbed; plumbing real). Stats are vectorized over the
    flattened batch buffer; features land as scalar columns the oracle
    recomputes byte-for-byte (ASCII payloads → unicode(char) = byte)."""
    return multimodal.extract_features(
        multimodal.attach_binary_payload(_docs(spark, sf_dir)),
        decoder=multimodal.fake_decoder,
    )


# -- r05 registry consolidation (VERDICT r04 #1) -------------------------------
#
# The driver's correctness gate checks the FIRST 50 registry entries; round 4
# grew the registry to 59, so 9 operators lost (or never had) a driver row.
# These composites join/union the single-operator queries — every leg is the
# UNCHANGED operator with its unchanged oracle fragment, so per-operator
# coverage is preserved bit-for-bit while the registry shrinks to 48.


def q_encode_temporal_roundtrip(spark, sf_dir):
    """Timestamp + date32 through the codec engine: l_shipdate rides as
    timestamp_ntz (epoch micros on the integer codec family — delta on
    time-ordered data) plus a derived DATE column (days as int32); decode
    must be bit-identical. Both project to tz-free integer scalars
    (micros / epoch days via timestampdiff/datediff, the parity-safe
    arithmetic) with the same expressions in the oracle."""
    df = _lineitem(spark, sf_dir).select(
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        F.col("l_shipdate").cast("date").alias("ship_day"),
    )
    manifest = CodecManifest.auto_for(df.schema, block_rows=8192)
    blocks = encode_table(df, manifest)
    ddl = (
        "l_orderkey bigint, l_linenumber int, l_shipdate timestamp_ntz, "
        "ship_day date"
    )
    return decode_table(blocks, ddl).select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', "
            "l_shipdate)"
        ).cast("long").alias("ship_us"),
        F.expr("datediff(ship_day, DATE'1970-01-01')").cast("long").alias(
            "ship_epoch_day"
        ),
    )


def q_encode_types_composite(spark, sf_dir):
    """Four independent encode->decode legs (presort/RLE-amplified,
    float32 dec-probe, uint64-as-decimal(20,0), timestamp+date epoch
    projection) as one tagged union: one gated row set pinning all four
    typed round trips. A union, not a join — (l_orderkey, l_linenumber)
    is NOT unique in the synthetic lineitem, so a key join would multiply
    rows. Sentinels keep the union null-free per the canonicalizer
    contract."""
    neg1 = F.lit(-1).cast("long")
    pre = q_encode_presort_roundtrip(spark, sf_dir).select(
        F.lit("presort").alias("part"),
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        F.lit(-1.0).alias("qty_f"),
        F.lit(-1.0).alias("disc_f"),
        F.lit("").alias("big_id_str"),
        neg1.alias("ship_us"),
        neg1.alias("ship_epoch_day"),
    )
    f32 = q_encode_float32_roundtrip(spark, sf_dir).select(
        F.lit("f32").alias("part"),
        "l_orderkey",
        "l_linenumber",
        F.lit("").alias("l_returnflag"),
        F.lit("").alias("l_linestatus"),
        F.lit(-1.0).alias("l_quantity"),
        "qty_f",
        "disc_f",
        F.lit("").alias("big_id_str"),
        neg1.alias("ship_us"),
        neg1.alias("ship_epoch_day"),
    )
    u64 = q_encode_uint64_roundtrip(spark, sf_dir).select(
        F.lit("u64").alias("part"),
        "l_orderkey",
        "l_linenumber",
        F.lit("").alias("l_returnflag"),
        F.lit("").alias("l_linestatus"),
        F.lit(-1.0).alias("l_quantity"),
        F.lit(-1.0).alias("qty_f"),
        F.lit(-1.0).alias("disc_f"),
        "big_id_str",
        neg1.alias("ship_us"),
        neg1.alias("ship_epoch_day"),
    )
    tmp = q_encode_temporal_roundtrip(spark, sf_dir).select(
        F.lit("temporal").alias("part"),
        "l_orderkey",
        "l_linenumber",
        F.lit("").alias("l_returnflag"),
        F.lit("").alias("l_linestatus"),
        F.lit(-1.0).alias("l_quantity"),
        F.lit(-1.0).alias("qty_f"),
        F.lit(-1.0).alias("disc_f"),
        F.lit("").alias("big_id_str"),
        "ship_us",
        "ship_epoch_day",
    )
    return pre.unionByName(f32).unionByName(u64).unionByName(tmp)


def q_multimodal_pipeline(spark, sf_dir):
    """Frame sampling + metadata + feature extraction in one row set at
    (doc, frame) grain — all three multimodal projections driver-gated in
    a single registry slot."""
    fr = q_multimodal_frames(spark, sf_dir)
    me = q_multimodal_meta(spark, sf_dir).select("doc_id", "mime")
    fe = q_multimodal_features(spark, sf_dir)
    return fr.join(me, "doc_id").join(fe, "doc_id")


def q_text_analysis(spark, sf_dir):
    """The doc-level text-analysis suite (lang-id, quality stats, token
    counts, repeated ngrams, fingerprint, paragraph-dedup) joined on
    doc_id — six operators, one gated row set. The paragraph-dedup leg
    uses 3-word paragraphs / max_df=4 so the drop is real at gate scale
    (145 of 9216 paragraphs at sf0.01); its clean_fp pins the reassembled
    cleaned text byte-for-byte via the shared rolling-hash fold."""
    docs = _docs(spark, sf_dir)
    out = textstats.lang_id(docs)
    for fn in (
        textstats.text_quality,
        textstats.token_counts,
        textstats.repeated_ngrams,
        textstats.doc_fingerprint,
        lambda d: textstats.paragraph_dedup(d, para_words=3, max_df=4),
    ):
        out = out.join(fn(docs), "doc_id")
    return out


def q_simhash_full(spark, sf_dir):
    """Per-doc simhash + its group's keeper and size: pins the hash AND
    the group reduction (simhash + simhash_groups consolidated)."""
    docs = _docs(spark, sf_dir)
    return (
        dedup.simhash_ids_fast(docs)
        .join(dedup.simhash_groups(docs), "simhash")
        .select("doc_id", "simhash", "keep_doc_id", "n_docs")
    )


def q_sample_split(spark, sf_dir):
    """Tagged union of the deterministic sampler, splitter, target-mixture
    resampler, and corpus shuffler; sentinels ('' / -1) keep the union
    null-free per the canonicalizer contract. ``aux`` is the per-leg
    evidence integer: the applied f_milli for the mixture leg (pins the
    scale-to-binding-source fraction math, not just the row set),
    shard*100000+pos (injective) for the order leg."""
    from xml2arrow_spark.pipeline.sampling import mixture_sample, shuffle_order

    aux_sentinel = F.lit(-1).cast("long").alias("aux")
    sa = q_stratified_sample(spark, sf_dir).select(
        F.lit("sample").alias("part"),
        "doc_id",
        "source",
        "n_chars",
        F.lit("").alias("split"),
        aux_sentinel,
    )
    sp = q_deterministic_split(spark, sf_dir).select(
        F.lit("split").alias("part"),
        "doc_id",
        "source",
        F.lit(-1).alias("n_chars"),
        "split",
        aux_sentinel,
    )
    mx = mixture_sample(
        _docs(spark, sf_dir), {"src0": 600, "src1": 300, "src2": 100}
    ).select(
        F.lit("mixture").alias("part"),
        "doc_id",
        "source",
        F.lit(-1).alias("n_chars"),
        F.lit("").alias("split"),
        F.col("f_milli").cast("long").alias("aux"),
    )
    so = shuffle_order(_docs(spark, sf_dir), n_shards=8).select(
        F.lit("order").alias("part"),
        "doc_id",
        "source",
        F.lit(-1).alias("n_chars"),
        F.lit("").alias("split"),
        (F.col("shard").cast("long") * 100000 + F.col("pos")).alias("aux"),
    )
    return sa.unionByName(sp).unionByName(mx).unionByName(so)


def q_encode_zonemap(spark, sf_dir):
    """Both zone-map pruning shapes in one gated row set (r05: frees a
    registry slot for pii_scrub): the single-int-range leg and the
    conjunctive int+string leg, tagged union with '' sentinels where the
    int leg has no string column. Pruning must stay invisible to results
    on BOTH legs."""
    a = q_encode_zonemap_scan(spark, sf_dir).select(
        F.lit("int").alias("part"),
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.lit("").alias("l_returnflag"),
    )
    b = q_encode_zonemap_multi(spark, sf_dir).select(
        F.lit("multi").alias("part"),
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_returnflag",
    )
    return a.unionByName(b)


def q_cosine_topk_all(spark, sf_dir):
    """Tagged union of the single-query (k=10) and batch (4 queries, k=5)
    exact cosine verifiers."""
    s = q_cosine_topk(spark, sf_dir).select(
        F.lit("single").alias("variant"),
        F.lit(0).cast("long").alias("query_id"),
        "vec_id",
        "cosine",
    )
    b = q_cosine_topk_batch(spark, sf_dir).select(
        F.lit("batch").alias("variant"),
        F.col("query_id").cast("long").alias("query_id"),
        "vec_id",
        "cosine",
    )
    return s.unionByName(b)


# -- driver contract ------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_encode_roundtrip(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """48 entries — the whole surface fits inside the driver's 50-query
    check window (VERDICT r04 #1). Ordered so the queries that never had
    (or lost) a driver row in r04 come first."""
    return {
        "tokenize": q_tokenize,
        "encode_roundtrip": q_encode_roundtrip,
        "encode_embeddings_roundtrip": q_encode_embeddings_roundtrip,
        "encode_dataset_resume": q_encode_dataset_resume,
        "streaming_encode": q_streaming_encode,
        "encode_types_composite": q_encode_types_composite,
        "multimodal_pipeline": q_multimodal_pipeline,
        "encode_cascade_roundtrip": q_encode_cascade_roundtrip,
        "encode_metadata": q_encode_metadata,
        "codec_selection": q_codec_selection,
        "token_stats": q_token_stats,
        "work_buckets": q_work_buckets,
        "salted_source_stats": q_salted_source_stats,
        "dedup_exact": q_dedup_exact,
        "minhash_signatures": q_minhash_signatures,
        "lsh_near_dup_pairs": q_lsh_near_dup_pairs,
        "incremental_near_dup": q_incremental_near_dup,
        "contamination_hits": q_contamination_hits,
        "streaming_dedup": q_streaming_dedup,
        "streaming_dedup_tiered": q_streaming_dedup_tiered,
        "streaming_near_dup": q_streaming_near_dup,
        "dataset_wide_subset": q_dataset_wide_subset,
        "dataset_compact_roundtrip": q_dataset_compact_roundtrip,
        "dataset_column_stats": q_dataset_column_stats,
        "sample_split": q_sample_split,
        "cosine_topk_all": q_cosine_topk_all,
        "near_dup_resolve": q_near_dup_resolve,
        "near_dup_resolve_reliable": q_near_dup_resolve_reliable,
        "corpus_prep": q_corpus_prep,
        "simhash_full": q_simhash_full,
        "neighbor_jaccard": q_neighbor_jaccard,
        "text_analysis": q_text_analysis,
        "quality_filter": q_quality_filter,
        "pii_scrub": q_pii_scrub,
        "tfidf_topk": q_tfidf_topk,
        "pack_sequences": q_pack_sequences,
        "lsh_ann_topk": q_lsh_ann_topk,
        "ivf_ann_topk": q_ivf_ann_topk,
        "embedding_near_dup": q_embedding_near_dup,
        "parse_scalars": q_parse_scalars,
        "unnest_orders": q_unnest_orders,
        "affine_transform": q_affine_transform,
        "sessionize": q_sessionize,
        "streaming_sessionize": q_streaming_sessionize,
        "event_type_stats": q_event_type_stats,
        "encode_typed_roundtrip": q_encode_typed_roundtrip,
        "encode_nullable_roundtrip": q_encode_nullable_roundtrip,
        "encode_fused_roundtrip": q_encode_fused_roundtrip,
        "encode_wide_subset": q_encode_wide_subset,
        "encode_zonemap": q_encode_zonemap,
    }


def oracle_sql() -> dict[str, str]:
    return all_oracles()
