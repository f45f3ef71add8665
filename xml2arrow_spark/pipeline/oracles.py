"""DuckDB oracle SQL for every driver-checked query.

Each oracle is rendered from the SAME dialect-neutral templates
(:mod:`xml2arrow_spark.pipeline.sqlgen`) the Spark operators are built from,
so agreement is by construction: integer arithmetic, sequential float folds,
and single IEEE ops only. Tables referenced by bare name (documents,
embeddings, lineitem) — the driver pre-registers them as DuckDB views.
"""

from __future__ import annotations

from xml2arrow_spark.pipeline import sqlgen as G
from xml2arrow_spark.pipeline.textstats import BPE_PATTERN, FINGERPRINT_MOD, STOPWORDS

D = "duckdb"
EMB_DIM = 64  # driver testdata embeddings are 64-dim at every sf

_TOKS = G.word_tokens_arr("text", D)
_DTOKS = G.adistinct(_TOKS, D)
# MinHash feature set = distinct word-trigram shingles (see pipeline.dedup)
_DSHINGLES = G.adistinct(G.shingles_expr(_TOKS, D), D)


def tokenize_sql() -> str:
    # scalar projection of the token table (the driver canonicalizer cannot
    # sort list columns): base-31 fold fingerprint + min/max per doc — the
    # same bit-identity gate as the raw array, in sortable form
    return f"""
WITH t AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         CAST({_TOKS} AS INTEGER[]) AS tokens,
         {G.asize(G.split_ws('text', D), D)} AS n_tok,
         source
  FROM documents
)
SELECT doc_id, n_tok, source,
       {G.afold('tokens', f'(acc * 31 + x) % {FINGERPRINT_MOD}', D)} AS tok_fp,
       coalesce(list_min(tokens), -1) AS tok_min,
       coalesce(list_max(tokens), -1) AS tok_max
FROM t
"""


def encode_dataset_resume_sql() -> str:
    """Oracle for the full dataset-mutation chain the resume gate runs:
    partial encode -> resume -> DELETE of ids ending in '7' -> UPSERT that
    replaces ids ending in '3' with 16-token truncations and inserts ids
    ending in '9' under ``doc_id || '::v2'`` -> ADD_COLUMNS that backfills a
    quality-score column family for ids ending in '1' (uncovered rows read
    as the -1 sentinel) -> TOMBSTONE (merge-on-read soft delete, left
    pending) of ids ending in '4' -> Bloom-indexed point LOOKUP of ids
    ending in '5' (the 'lookup' leg). The oracle states the final row set
    directly over the raw projection — resume, delete, upsert, the family
    join, the read-side tombstone anti-join, and the Bloom block filter
    must all be invisible except for exactly these row edits."""
    return f"""
WITH t AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         CAST({_TOKS} AS INTEGER[]) AS tokens,
         {G.asize(G.split_ws('text', D), D)} AS n_tok,
         source
  FROM documents
),
final AS (
  SELECT * FROM t WHERE doc_id NOT LIKE '%7' AND doc_id NOT LIKE '%3'
  UNION ALL
  SELECT doc_id, tokens[1:16] AS tokens,
         CAST(len(tokens[1:16]) AS INTEGER) AS n_tok, source
  FROM t WHERE doc_id LIKE '%3'
  UNION ALL
  SELECT doc_id || '::v2' AS doc_id, tokens, n_tok, source
  FROM t WHERE doc_id LIKE '%9'
)
, proj AS (
SELECT doc_id, n_tok, source,
       {G.afold('tokens', f'(acc * 31 + x) % {FINGERPRINT_MOD}', D)} AS tok_fp,
       coalesce(list_min(tokens), -1) AS tok_min,
       coalesce(list_max(tokens), -1) AS tok_max,
       CASE WHEN doc_id LIKE '%1' THEN n_tok % 31 ELSE -1 END AS q_score
FROM final
)
-- live-tree leg: ids ending in '4' were TOMBSTONED (merge-on-read soft
-- delete, pending — not folded) after the snapshot below was frozen; the
-- live read must hide them. Replaced ids end '3' and inserted ids end
-- '::v2', so the LIKE touches only original base rows, as in the engine.
SELECT *, 'all' AS leg FROM proj WHERE doc_id NOT LIKE '%4'
UNION ALL
-- bloom leg: the engine serves these rows through Bloom-pruned point
-- lookups; the truth is simply the same projection restricted to the batch
SELECT *, 'lookup' AS leg FROM proj WHERE doc_id LIKE '%5'
UNION ALL
-- snapshot leg: the engine freezes the dataset right after the DELETE and
-- reads the frozen view at the end, after the upsert and family backfill
-- mutated the live tree — so the truth is the post-delete state of t, with
-- no upsert edits and the family's q_score sentinel everywhere
SELECT doc_id, n_tok, source,
       {G.afold('tokens', f'(acc * 31 + x) % {FINGERPRINT_MOD}', D)} AS tok_fp,
       coalesce(list_min(tokens), -1) AS tok_min,
       coalesce(list_max(tokens), -1) AS tok_max,
       -1 AS q_score, 'snap' AS leg
FROM t WHERE doc_id NOT LIKE '%7'
"""


def token_stats_sql() -> str:
    """Exact per-source stats + the KMV vocabulary-size leg: the sketch
    rule (hash -> k smallest distinct -> (k-1)*M // h_k) is restated in
    DuckDB primitives, so the ESTIMATE itself is pinned bit-for-bit."""
    from xml2arrow_spark.pipeline.sketches import KMV_K

    return f"""
WITH tok AS (
  SELECT source, CAST({_TOKS} AS INTEGER[]) AS tokens,
         {G.asize(G.split_ws('text', D), D)} AS n_tok
  FROM documents
),
stats AS (
  SELECT source,
         COUNT(*) AS n_docs,
         CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
         MIN(list_min(tokens)) AS min_token,
         MAX(list_max(tokens)) AS max_token
  FROM tok GROUP BY source
),
pairs AS (
  SELECT DISTINCT source, {G.kmv_hash_expr('t', D)} AS h
  FROM (SELECT source, unnest(tokens) AS t FROM tok)
),
ranked AS (
  SELECT source, h, row_number() OVER (PARTITION BY source ORDER BY h) AS rn
  FROM pairs
),
sk AS (
  SELECT source, count(*) AS n_h, max(h) AS h_k
  FROM ranked WHERE rn <= {KMV_K} GROUP BY source
)
SELECT stats.*,
       coalesce({G.kmv_estimate_expr('n_h', 'h_k', KMV_K, D)}, 0) AS n_vocab_est
FROM stats LEFT JOIN sk USING (source)
"""


def work_buckets_sql() -> str:
    return f"""
WITH tok AS (
  SELECT {G.asize(G.split_ws('text', D), D)} AS n_tok FROM documents
)
SELECT CAST(least(length(bin(greatest(CAST(n_tok AS BIGINT), 1))) - 1, 7) AS INTEGER)
         AS work_bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens
FROM tok GROUP BY 1
"""


def salted_source_stats_sql() -> str:
    # the Spark side routes through a two-stage SALTED aggregation; the
    # oracle is the plain GROUP BY — salting must never change results
    return f"""
WITH tok AS (
  SELECT source, {G.asize(G.split_ws('text', D), D)} AS n_tok FROM documents
)
SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS total_tokens
FROM tok GROUP BY source
"""


def record_dedup_sql() -> str:
    return """
SELECT md5(text) AS text_md5, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY text
"""


def token_span_dedup_sql(span: int = 8, max_df: int = 2) -> str:
    """Oracle twin of dedup.token_span_dedup: same packed double-hash
    window keys, same df threshold, same coverage removal and base-31
    fold of the surviving token sequence."""
    k = int(span)
    keys = G.span_keys_expr("tokens", k, D)
    kept = G.span_kept_expr("tokens", "fstarts", k, D)
    fold = G.afold("kept", f"(acc * 31 + x) % {FINGERPRINT_MOD}", D)
    return f"""
WITH sd_tok AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         CAST({_TOKS} AS INTEGER[]) AS tokens
  FROM documents
),
sd_keys AS (
  SELECT doc_id, {keys} AS keys FROM sd_tok
),
sd_win AS (
  SELECT doc_id, unnest(keys) AS skey,
         generate_subscripts(keys, 1) - 1 AS start0
  FROM sd_keys
),
sd_freq AS (
  SELECT skey FROM sd_win GROUP BY skey
  HAVING COUNT(DISTINCT doc_id) > {int(max_df)}
),
sd_starts AS (
  SELECT doc_id, list_sort(list(start0)) AS fstarts
  FROM sd_win WHERE skey IN (SELECT skey FROM sd_freq)
  GROUP BY doc_id
),
sd_base AS (
  SELECT t.doc_id, t.tokens,
         COALESCE(s.fstarts, CAST([] AS BIGINT[])) AS fstarts
  FROM sd_tok t LEFT JOIN sd_starts s USING (doc_id)
),
sd_kept AS (
  SELECT doc_id, tokens, fstarts, {kept} AS kept FROM sd_base
)
SELECT doc_id,
       {G.asize('tokens', D)} AS n_tok,
       {G.asize('fstarts', D)} AS n_frequent_spans,
       {G.asize('kept', D)} AS n_kept,
       {fold} AS kept_fp
FROM sd_kept
"""


def dedup_exact_sql() -> str:
    """Tagged union of record-grain exact dedup and token-span (substring)
    dedup — the two exact members of the dedup family in one gated row
    set; sentinels keep the union null-free per the canonicalizer
    contract."""
    return f"""
WITH rd AS ({record_dedup_sql()}),
sd AS ({token_span_dedup_sql()})
SELECT 'record' AS part, text_md5 AS key,
       CAST(keep_doc_id AS VARCHAR) AS doc_id,
       n_copies, CAST(-1 AS INT) AS n_tok,
       CAST(-1 AS INT) AS n_frequent_spans,
       CAST(-1 AS INT) AS n_kept, CAST(-1 AS BIGINT) AS kept_fp
FROM rd
UNION ALL
SELECT 'span' AS part, '' AS key, doc_id,
       CAST(-1 AS BIGINT) AS n_copies, n_tok, n_frequent_spans, n_kept,
       kept_fp
FROM sd
"""


def _sig_literal() -> str:
    return "[" + ", ".join(G.minhash_expr("dtoks", i, D) for i in range(G.MINHASH_K)) + "]"


def minhash_signatures_sql() -> str:
    bands = ",\n       ".join(
        f"{G.band_expr('sig', b, D)} AS band{b}" for b in range(G.MINHASH_BANDS)
    )
    sig_cols = ",\n       ".join(
        f"{G.element('sig', i + 1, D)} AS sig{i}" for i in range(G.MINHASH_K)
    )
    return f"""
WITH d AS (SELECT doc_id, {_DSHINGLES} AS dtoks FROM documents),
s AS (SELECT doc_id, {_sig_literal()} AS sig FROM d)
SELECT doc_id,
       {sig_cols},
       {bands}
FROM s
"""


def lsh_near_dup_pairs_sql(threshold_milli: int = 800, src: str = "documents") -> str:
    band_rows = "\n  UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_pos, {G.band_expr('sig', b, D)} AS band_key FROM s"
        for b in range(G.MINHASH_BANDS)
    )
    return f"""
WITH d AS (SELECT doc_id, {_DSHINGLES} AS dtoks FROM {src}),
s AS (SELECT d.doc_id, {_sig_literal()} AS sig FROM d),
bands AS (
  {band_rows}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_pos = b.band_pos AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
v AS (
  SELECT doc_a, doc_b,
         {G.asize(G.aintersect('da.dtoks', 'db.dtoks', D), D)} AS inter_size,
         {G.asize('da.dtoks', D)} + {G.asize('db.dtoks', D)} AS both_size
  FROM cand
  JOIN d da ON da.doc_id = cand.doc_a
  JOIN d db ON db.doc_id = cand.doc_b
)
SELECT doc_a, doc_b, inter_size, (both_size - inter_size) AS union_size
FROM v WHERE inter_size * 1000 >= {threshold_milli} * (both_size - inter_size)
"""


def incremental_near_dup_sql() -> str:
    """The incremental contract: pairs over the WHOLE corpus, restricted to
    pairs touching the 'new' batch (doc_id % 5 = 0). The Spark side computes
    this via lsh_near_dup_pairs_incremental against the old batch's
    persisted signature table — old signatures reused, old×old pairs never
    re-emitted."""
    return f"""
WITH p AS ({lsh_near_dup_pairs_sql()})
SELECT doc_a, doc_b, inter_size, union_size
FROM p WHERE doc_a % 5 = 0 OR doc_b % 5 = 0
"""


def dataset_wide_subset_sql() -> str:
    # Spark decodes 2 of the 4 wide-stored columns; oracle = raw projection
    return """
SELECT l_orderkey, l_quantity FROM lineitem
"""


def simhash_sql() -> str:
    return f"""
SELECT doc_id, {G.simhash_expr(_TOKS, D)} AS simhash FROM documents
"""


def simhash_groups_sql() -> str:
    return f"""
WITH s AS (SELECT doc_id, {G.simhash_expr(_TOKS, D)} AS simhash FROM documents)
SELECT simhash, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_docs
FROM s GROUP BY simhash
"""


def neighbor_jaccard_sql() -> str:
    dt_a = G.adistinct(G.word_tokens_arr("text_a", D), D)
    dt_b = G.adistinct(G.word_tokens_arr("text_b", D), D)
    return f"""
WITH p AS (
  SELECT doc_id AS doc_a,
         lead(doc_id) OVER w AS doc_b,
         text AS text_a,
         lead(text) OVER w AS text_b
  FROM documents
  WINDOW w AS (PARTITION BY source ORDER BY n_chars, doc_id)
),
j AS (
  SELECT doc_a, doc_b, {dt_a} AS ta, {dt_b} AS tb
  FROM p WHERE doc_b IS NOT NULL
)
SELECT doc_a, doc_b,
       {G.asize(G.aintersect('ta', 'tb', D), D)} AS inter_size,
       {G.asize('ta', D)} + {G.asize('tb', D)}
         - {G.asize(G.aintersect('ta', 'tb', D), D)} AS union_size
FROM j
"""


def lang_id_sql() -> str:
    langs = list(STOPWORDS)
    hits = []
    for lang in langs:
        lits = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        hits.append(
            f"{G.asize(G.aintersect('dw', f'[{lits}]', D), D)} AS hits_{lang}"
        )
    best = "greatest(" + ", ".join(f"hits_{lang}" for lang in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN {best} > 0 AND hits_{lang} = {best} THEN '{lang}'" for lang in langs
    ) + " ELSE 'und' END"
    return f"""
WITH d AS (SELECT doc_id, {G.adistinct(G.split_ws('text', D), D)} AS dw FROM documents),
h AS (SELECT doc_id, {', '.join(hits)} FROM d)
SELECT doc_id, {', '.join(f'hits_{lang}' for lang in langs)},
       {case} AS predicted_lang
FROM h
"""


def text_quality_sql() -> str:
    words = G.split_ws("text", D)
    return f"""
SELECT doc_id,
       {G.asize(words, D)} AS n_words,
       {G.asize(G.adistinct(words, D), D)} AS n_distinct_words,
       CAST(length(text) AS INTEGER) AS n_chars,
       {G.asize("regexp_extract_all(text, '[^A-Za-z0-9 ]')", D)} AS n_punct,
       CAST(list_max({G.transform(words, 'w', 'length(w)', D)}) AS INTEGER) AS max_word_len,
       CAST({G.asize(G.adistinct(words, D), D)} AS DOUBLE)
         / CAST({G.asize(words, D)} AS DOUBLE) AS distinct_ratio
FROM documents
"""


def token_counts_sql() -> str:
    return f"""
SELECT doc_id,
       {G.asize(G.split_ws('text', D), D)} AS ws_tokens,
       {G.asize(f"regexp_extract_all(text, '{BPE_PATTERN}')", D)} AS bpe_tokens
FROM documents
"""


def repeated_ngrams_sql() -> str:
    sh = G.shingles_expr("_toks", D)
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS _toks FROM documents),
s AS (SELECT doc_id, {G.asize(sh, D)} AS total_ngrams,
             {G.asize(G.adistinct(sh, D), D)} AS distinct_ngrams
      FROM t)
SELECT doc_id, total_ngrams, distinct_ngrams,
       CASE WHEN total_ngrams > 0
            THEN CAST(total_ngrams - distinct_ngrams AS DOUBLE)
                 / CAST(total_ngrams AS DOUBLE)
            ELSE CAST(0.0 AS DOUBLE) END AS repeat_ratio
FROM s
"""


def quality_filter_sql(
    min_words: int = 30, max_word_len: int = 40, min_distinct_ratio: float = 0.5
) -> str:
    return f"""
WITH q AS ({text_quality_sql()})
SELECT * FROM q
WHERE n_words >= {min_words}
  AND max_word_len <= {max_word_len}
  AND distinct_ratio >= CAST({min_distinct_ratio} AS DOUBLE)
"""


def doc_fingerprint_sql() -> str:
    fold = G.afold(_TOKS, f"(acc * 31 + x) % {FINGERPRINT_MOD}", D)
    return f"SELECT doc_id, {fold} AS fingerprint FROM documents"


def cosine_topk_sql(query_id: int = 0, k: int = 10) -> str:
    return f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {query_id})
SELECT vec_id, {G.cosine_expr('embedding', 'qv', D)} AS cosine
FROM embeddings CROSS JOIN q
WHERE vec_id <> {query_id}
ORDER BY cosine DESC, vec_id
LIMIT {k}
"""


# Hyperplanes per band for the GATE queries, pinned at the sf0.01 geometry
# (500 vectors -> lsh_planes_for(500) = 4). The Spark gate queries pass
# n_rows=ANN_ROWS explicitly so both sides share geometry at ANY sf the
# parity harness runs at (a live-count derivation on the Spark side would
# diverge from this static SQL at sf0.1's 2000 vectors — ADVICE r02). The
# operator API itself still defaults to size-derived geometry.
ANN_ROWS = G.lsh_planes_for(500)


def _band_keys(src: str) -> str:
    return ", ".join(
        f"{G.lsh_band_key_expr(src, EMB_DIM, b, ANN_ROWS, D)} AS bk{b}"
        for b in range(G.LSH_BANDS)
    )


def lsh_ann_topk_sql(query_id: int = 0, k: int = 5) -> str:
    any_band = " OR ".join(f"b.bk{i} = q.qbk{i}" for i in range(G.LSH_BANDS))
    qkeys = ", ".join(f"bk{i} AS qbk{i}" for i in range(G.LSH_BANDS))
    return f"""
WITH b AS (SELECT vec_id, embedding, {_band_keys('embedding')} FROM embeddings),
q AS (SELECT embedding AS qv, {qkeys} FROM b WHERE vec_id = {query_id})
SELECT vec_id, {G.cosine_expr('embedding', 'qv', D)} AS cosine
FROM b CROSS JOIN q
WHERE ({any_band}) AND vec_id <> {query_id}
ORDER BY cosine DESC, vec_id
LIMIT {k}
"""


def ivf_ann_topk_sql(query_id: int = 0, k: int = 5) -> str:
    """Unrolled twin of similarity.ivf_train + ivf_ann_topk: the SAME
    integer-exact k-means (floor(x*SCALE) quantization, (sqdist, cell)
    tie-broken assignment, floor(sum/count) centroid update, empty cells
    keep their centroid) as IVF_ITERS chained CTE rounds, then an
    NPROBE-nearest-cells probe + exact cosine. Integer sums are
    associative, so Spark's distributed training and this serial chain
    produce bit-identical codebooks.

    Training rounds iterate over the qt CTE — the deterministic
    IVF_TRAIN_MILLI/1000 hash-bucket sample (the r05 sampled-training
    geometry, VERDICT r04 #3); only the final assignment scans every
    vector. The sample rule is a pure function of vec_id, so both engines
    select the identical training set."""
    K, ITERS, NPROBE = G.IVF_CELLS, G.IVF_ITERS, G.IVF_NPROBE
    quant = G.ivf_quant_expr("embedding", D)

    def assign_cte(name: str, cents: str, src: str = "q") -> str:
        dist = G.ivf_sqdist_expr("q.qv", "c.qv", D)
        return f"""{name} AS (
  SELECT vec_id, qv, cell FROM (
    SELECT q.vec_id, q.qv, c.cell,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY {dist}, c.cell) AS rn
    FROM {src} q CROSS JOIN {cents} c) WHERE rn = 1
)"""

    def update_cte(name: str, assigned: str, prev: str) -> str:
        # EXACT integer floor division, matching Python's ``s // n`` in
        # similarity.ivf_train: DuckDB's ``//`` truncates toward zero and
        # a float division rounds the sum to double first (off-by-one once
        # a coordinate sum exceeds 2^53 — ADVICE r03), so floor(s/n) is
        # spelled (s - ((s % n) + n) % n) // n, exact at any magnitude.
        sums = ", ".join(
            f"CAST((SUM(qv[{i + 1}]) - ((SUM(qv[{i + 1}]) % COUNT(*)) "
            f"+ COUNT(*)) % COUNT(*)) // COUNT(*) AS BIGINT)"
            for i in range(EMB_DIM)
        )
        return f"""{name} AS (
  SELECT p.cell, coalesce(u.qv, p.qv) AS qv
  FROM {prev} p LEFT JOIN (
    SELECT cell, [{sums}] AS qv FROM {assigned} GROUP BY cell) u USING (cell)
)"""

    samp = G.sample_hash_expr("vec_id", D)
    ctes = [
        f"q AS (SELECT vec_id, embedding, {quant} AS qv FROM embeddings)",
        f"qt AS (SELECT * FROM q WHERE {samp} < {G.IVF_TRAIN_MILLI})",
        f"c0 AS (SELECT vec_id AS cell, qv FROM q WHERE vec_id < {K})",
    ]
    for it in range(ITERS):
        ctes.append(assign_cte(f"a{it + 1}", f"c{it}", src="qt"))
        ctes.append(update_cte(f"c{it + 1}", f"a{it + 1}", f"c{it}"))
    ctes.append(assign_cte("afinal", f"c{ITERS}"))
    probe_dist = G.ivf_sqdist_expr("qq.qv", "c.qv", D)
    ctes.append(
        f"""probe AS (
  SELECT cell FROM (
    SELECT c.cell, row_number() OVER (ORDER BY {probe_dist}, c.cell) AS rn
    FROM c{ITERS} c CROSS JOIN (SELECT qv FROM q WHERE vec_id = {query_id}) qq)
  WHERE rn <= {NPROBE}
)"""
    )
    cos = G.cosine_expr("q.embedding", "qe.embedding", D)
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT q.vec_id, {cos} AS cosine
FROM q
JOIN afinal USING (vec_id)
CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = {query_id}) qe
WHERE afinal.cell IN (SELECT cell FROM probe) AND q.vec_id <> {query_id}
ORDER BY cosine DESC, q.vec_id
LIMIT {k}
"""
    )


def embedding_near_dup_sql(threshold: float = 0.3) -> str:
    band_rows = "\n  UNION ALL ".join(
        f"SELECT vec_id, {b} AS band_pos, bk{b} AS band_key FROM bk"
        for b in range(G.LSH_BANDS)
    )
    cos = G.cosine_expr("ea.embedding", "eb.embedding", D)
    return f"""
WITH bk AS (SELECT vec_id, {_band_keys('embedding')} FROM embeddings),
bands AS (
  {band_rows}
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bands a JOIN bands b
    ON a.band_pos = b.band_pos AND a.band_key = b.band_key AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, {cos} AS cosine
FROM cand
JOIN embeddings ea ON ea.vec_id = cand.vec_a
JOIN embeddings eb ON eb.vec_id = cand.vec_b
WHERE {cos} >= CAST({threshold} AS DOUBLE)
"""


def sessionize_sql(gap_seconds: int = 1800) -> str:
    gap_us = gap_seconds * 1_000_000
    return f"""
WITH e AS (
  SELECT user_id, event_id,
         date_diff('microsecond', TIMESTAMP '1970-01-01', ts) AS tse
  FROM events
), g AS (
  SELECT user_id, event_id, tse,
         CASE WHEN tse - lag(tse) OVER (PARTITION BY user_id ORDER BY tse, event_id)
                   > {gap_us} THEN 1 ELSE 0 END AS new_sess
  FROM e
), s AS (
  SELECT user_id, event_id, tse,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tse, event_id)
              AS BIGINT) AS session_idx
  FROM g
)
SELECT user_id, session_idx, COUNT(*) AS n_events,
       MIN(tse) AS t_start_us, MAX(tse) AS t_end_us,
       MAX(tse) - MIN(tse) AS dur_us
FROM s GROUP BY user_id, session_idx
"""


def event_type_stats_sql() -> str:
    return """
SELECT event_type, COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       MIN(value) AS min_value, MAX(value) AS max_value
FROM events GROUP BY event_type
"""


def encode_typed_roundtrip_sql() -> str:
    # oracle recomputes the UNENCODED projection; the Spark side must decode
    # back to exactly these values (floats bit-identical via plain_float)
    return """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
       l_returnflag, l_linestatus
FROM lineitem
"""


def unnest_orders_sql() -> str:
    return """
SELECT l_orderkey,
       CAST(row_number() OVER (PARTITION BY l_orderkey
                               ORDER BY l_linenumber, l_partkey, l_quantity) - 1
            AS INTEGER) AS item_idx,
       l_linenumber, l_partkey, l_quantity
FROM lineitem
"""


def affine_transform_sql() -> str:
    return """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * CAST(0.01 AS DOUBLE) + CAST(100.0 AS DOUBLE) AS adjusted
FROM lineitem
"""


def near_dup_resolve_sql() -> str:
    """Connected components over the LSH near-dup pairs via a recursive CTE:
    reach(node, lbl) closes the symmetric edge relation transitively; the
    canonical id is the minimum reachable node."""
    return f"""
WITH RECURSIVE pairs AS ({lsh_near_dup_pairs_sql()}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
reach(node, lbl) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
)
SELECT node AS doc_id, MIN(lbl) AS canonical_id FROM reach GROUP BY node
"""


def corpus_prep_sql() -> str:
    """The composed pipeline: quality gate → exact dedup (keep min id per
    text) → transitive near-dup resolution on the SURVIVORS (keep canonical
    ids only) → tokenize + fingerprint. Every stage reuses the stage
    oracle's own SQL, so agreement with the Spark composition is by
    construction."""
    quality = quality_filter_sql()
    pairs = lsh_near_dup_pairs_sql(src="exact_kept")
    fold = G.afold(
        f"CAST({_TOKS} AS INTEGER[])", f"(acc * 31 + x) % {FINGERPRINT_MOD}", D
    )
    return f"""
WITH RECURSIVE q AS ({quality}),
qdocs AS (SELECT d.* FROM documents d JOIN q ON q.doc_id = d.doc_id),
exact_kept AS (
  SELECT d.* FROM qdocs d
  JOIN (SELECT text, MIN(doc_id) AS keep FROM qdocs GROUP BY text) k
    ON k.keep = d.doc_id
),
pairs AS ({pairs}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
reach(node, lbl) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node
),
canon AS (SELECT node, MIN(lbl) AS canonical FROM reach GROUP BY node),
survivors AS (
  SELECT d.* FROM exact_kept d
  LEFT JOIN canon c ON c.node = d.doc_id
  WHERE c.node IS NULL OR c.canonical = d.doc_id
)
SELECT CAST(doc_id AS VARCHAR) AS doc_id, source,
       {G.asize(G.split_ws('text', D), D)} AS n_tok,
       {fold} AS tok_fp
FROM survivors
"""


def encode_metadata_sql() -> str:
    """Per-(column, codec) value counts. Value counts are recomputed from
    the raw data (layout-independent, unlike byte counts); the codec names
    pin the selector's expected choices on the driver fixtures — a
    regression gate on codec auto-selection itself. All four columns are
    AUTO-selected (r05: the scale-invariant canonical-block costing made
    the doc_id choice deterministic across sfs, so the r04 explicit
    override is gone — fsst at every scale)."""
    return f"""
WITH t AS (SELECT {G.asize(G.split_ws('text', D), D)} AS n_tok FROM documents)
SELECT 'doc_id' AS name, 'fsst' AS codec, CAST(COUNT(*) AS BIGINT) AS n_values FROM t
UNION ALL
SELECT 'tokens', 'dict', CAST(SUM(n_tok) AS BIGINT) FROM t
UNION ALL
SELECT 'n_tok', 'for', CAST(COUNT(*) AS BIGINT) FROM t
UNION ALL
SELECT 'source', 'dict_str', CAST(COUNT(*) AS BIGINT) FROM t
"""


def codec_selection_sql() -> str:
    """Pinned expected manifest resolution on the driver fixtures (doc ids
    are digit strings with heavy shared 2-byte chunks → fsst under the
    r05 canonical-block costing, at EVERY corpus scale — the r04 manifest
    override is gone; tokens are zipf-ish small ints → dict; n_tok has a
    narrow range → FOR; source is low-cardinality → dict_str)."""
    return """
SELECT 'doc_id' AS "column", 'fsst' AS codec
UNION ALL SELECT 'n_tok', 'for'
UNION ALL SELECT 'source', 'dict_str'
UNION ALL SELECT 'tokens', 'dict'
"""


def encode_nullable_roundtrip_sql() -> str:
    # oracle recomputes the UNENCODED nullable projection; Spark must decode
    # bool_pack + validity sections back to exactly these values. Nulls are
    # mapped to sentinels in the final projection on BOTH sides (null
    # positions still gate; None-vs-NaN pandas representation does not)
    return """
WITH p AS (
  SELECT l_orderkey, l_linenumber,
         CASE WHEN l_quantity > CAST(25.0 AS DOUBLE) THEN 1
              WHEN l_quantity > CAST(10.0 AS DOUBLE) THEN 0 END AS heavy_flag,
         CASE WHEN l_discount > CAST(0.04 AS DOUBLE) THEN l_tax END AS tax_opt,
         CASE WHEN l_partkey % 7 = 0 THEN l_suppkey END AS supp_opt,
         CASE WHEN l_linenumber >= 3 THEN l_returnflag END AS flag_opt
  FROM lineitem
)
SELECT l_orderkey, l_linenumber,
       CAST(coalesce(heavy_flag, -1) AS INTEGER) AS heavy_flag,
       coalesce(tax_opt, CAST(-1.0 AS DOUBLE)) AS tax_opt,
       CAST(coalesce(supp_opt, -1) AS BIGINT) AS supp_opt,
       coalesce(flag_opt, '<null>') AS flag_opt
FROM p
"""


def encode_fused_roundtrip_sql() -> str:
    return """
SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
       l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus
FROM lineitem
"""


def encode_presort_roundtrip_sql() -> str:
    # the Spark side permutes rows in-task before encoding (RLE amplifier);
    # the order-insensitive value hash pins the multiset against the raw rows
    return """
SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus, l_quantity
FROM lineitem
"""


def encode_float32_roundtrip_sql() -> str:
    # both engines: correctly-rounded double->float32 cast, then the exact
    # float32->double widening — bit parity by IEEE 754
    return """
SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_quantity AS REAL) AS DOUBLE) AS qty_f,
       CAST(CAST(l_discount AS REAL) AS DOUBLE) AS disc_f
FROM lineitem
"""


def encode_uint64_roundtrip_sql() -> str:
    # HUGEINT carries the +2^63 shift exactly; digit-string output matches
    # Spark's scale-0 decimal-to-string rendering
    return """
SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_orderkey AS HUGEINT) + 9223372036854775808 AS VARCHAR)
         AS big_id_str
FROM lineitem
"""


def encode_wide_subset_sql() -> str:
    # Spark decodes only these 3 of the 6 encoded columns (wide layout
    # column pruning); the oracle is the raw projection
    return """
SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
"""


def encode_zonemap_scan_sql() -> str:
    # Spark zone-prunes blocks then row-filters; the oracle is the plain
    # filtered projection — pruning must be invisible to results
    return """
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem WHERE l_orderkey BETWEEN 10000 AND 30000
"""


def encode_zonemap_multi_sql() -> str:
    # conjunction of an int range and a string range (mixed-type zone
    # pruning); the oracle is the plain doubly-filtered projection
    return """
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
FROM lineitem
WHERE l_orderkey BETWEEN 10000 AND 30000
  AND l_returnflag BETWEEN 'A' AND 'N'
"""


# powers of 31 as an exact BIGINT literal list (31^7 < 2^53, so even the
# doubled-up DuckDB arithmetic stays exact)
_POW31 = "[" + ", ".join(str(31**i) for i in range(8)) + "]"


def multimodal_features_sql() -> str:
    """Byte-exact twin of multimodal.extract_features + fake_decoder. The
    payload is the utf-8 encoding of ``text``; the driver fixtures are pure
    ASCII, so ``unicode(text[i])`` IS byte i."""
    bsum = "coalesce(list_sum(by), 0)"
    head = (
        f"coalesce(list_sum(list_transform(range(1, least(n, 8) + 1), "
        f"i -> by[i] * ({_POW31})[i])), 0)"
    )
    stride = (
        "coalesce(list_sum(list_transform("
        "range(1, n + 1, greatest(n // 4, 1)), i -> by[i])), 0)"
    )
    return f"""
WITH b AS (
  SELECT doc_id, CAST(length(text) AS INTEGER) AS n,
         list_transform(range(1, length(text) + 1), i -> unicode(text[i])) AS by
  FROM documents
)
SELECT doc_id,
       n AS n_bytes,
       CAST({bsum} AS BIGINT) AS byte_sum,
       CAST({head} % 2147483647 AS BIGINT) AS head_hash,
       CAST(n % 251 AS DOUBLE) AS feature_0,
       CAST({bsum} % 997 AS DOUBLE) AS feature_1,
       CAST(coalesce(list_min(by), 0) AS DOUBLE) AS feature_2,
       CAST(coalesce(list_max(by), 0) AS DOUBLE) AS feature_3,
       CAST(coalesce(by[1], 0) AS DOUBLE) AS feature_4,
       CAST(coalesce(by[n], 0) AS DOUBLE) AS feature_5,
       CAST(coalesce((by[1] * 31 + by[n]) % 509, 0) AS DOUBLE) AS feature_6,
       CAST({stride} % 997 AS DOUBLE) AS feature_7
FROM b
"""


def multimodal_frames_sql(k: int = 4) -> str:
    """Byte-exact twin of multimodal.sample_frames on ASCII payloads:
    frame j of an n-byte payload is the 0-based window [j*n//k, (j+1)*n//k);
    DuckDB's 1-based inclusive list slice makes that by[lo+1:hi]."""
    frames = ", ".join(str(j) for j in range(k))
    return f"""
WITH b AS (
  SELECT doc_id, CAST(length(text) AS INTEGER) AS n,
         list_transform(range(1, length(text) + 1), i -> unicode(text[i])) AS by
  FROM documents
),
g AS (
  SELECT doc_id, fi.frame_idx,
         (fi.frame_idx * n) // {k} AS lo,
         ((fi.frame_idx + 1) * n) // {k} AS hi,
         by
  FROM b CROSS JOIN (SELECT unnest([{frames}]) AS frame_idx) fi
)
SELECT doc_id,
       CAST(frame_idx AS INTEGER) AS frame_idx,
       CAST(hi - lo AS INTEGER) AS frame_len,
       CAST(coalesce(list_sum(by[lo + 1:hi]), 0) AS BIGINT) AS frame_sum
FROM g
"""


def multimodal_meta_sql() -> str:
    return """
SELECT doc_id, 'text/plain' AS mime,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes
FROM documents
"""


ORACLES: dict[str, str] = {}


def streaming_dedup_sql() -> str:
    # first-arrival winners under range-ordered replay == min id per text
    return """
SELECT md5(text) AS text_md5, CAST(min(doc_id) AS BIGINT) AS keep_doc_id
FROM documents GROUP BY md5(text)
"""


def contamination_hits_sql(min_overlap: int = 2) -> str:
    # eval set = doc_id % 97 == 0; a doc is contaminated when it shares
    # >= min_overlap distinct trigram shingles with ANY eval doc
    return f"""
WITH ds AS (
  SELECT doc_id, unnest(CAST({_DSHINGLES} AS BIGINT[])) AS sh FROM documents
),
es AS (SELECT DISTINCT sh FROM ds WHERE doc_id % 97 = 0)
SELECT doc_id, COUNT(*) AS n_hits
FROM ds JOIN es USING (sh)
GROUP BY doc_id
HAVING COUNT(*) >= {min_overlap}
"""


def tfidf_topk_sql(k: int = 3) -> str:
    # integer tf-idf surrogate: (tf * N * 1000) // df — all positive, so
    # DuckDB's truncating // equals Spark's div; ties (score desc, token)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(CAST({_TOKS} AS BIGINT[])) AS token FROM documents
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dfq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
nn AS (SELECT COUNT(*) AS n FROM documents),
s AS (
  SELECT tf.doc_id, tf.token,
         CAST((tf.tf * nn.n * 1000) // dfq.df AS BIGINT) AS score_milli
  FROM tf JOIN dfq USING (token) CROSS JOIN nn
),
r AS (SELECT *, CAST(row_number() OVER (
        PARTITION BY doc_id ORDER BY score_milli DESC, token
      ) AS INTEGER) AS rank FROM s)
SELECT doc_id, rank, token, score_milli FROM r WHERE rank <= {k}
"""


def pack_sequences_sql(budget: int = 4096) -> str:
    n_tok = G.asize(G.split_ws("text", D), D)
    return f"""
WITH t AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, source,
         CAST({n_tok} AS BIGINT) AS n_tok
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tok,
         CAST(SUM(n_tok) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS cum
  FROM t
)
SELECT doc_id, source, cum - n_tok AS tok_offset,
       (cum - n_tok) // {budget} AS bin_start,
       greatest(cum - n_tok, cum - 1) // {budget} AS bin_end
FROM c
"""


def chunk_sequences_sql(max_len: int = 48, stride: int = 32) -> str:
    """Oracle twin of textstats.chunk_sequences: same exact integer chunk
    count (non-negative operands, so DuckDB's truncating // == floor),
    same stride starts, same clamped slice and base-31 fold."""
    L, st = int(max_len), int(stride)
    return f"""
WITH ck_tok AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
         CAST({_TOKS} AS INTEGER[]) AS tokens
  FROM documents
),
ck_n AS (
  SELECT doc_id, tokens,
         CASE WHEN len(tokens) <= 0 THEN 0
              ELSE 1 + greatest(0, len(tokens) - {L} + {st} - 1) // {st}
         END AS n_chunks
  FROM ck_tok
),
ck_rows AS (
  SELECT doc_id, tokens,
         CAST(unnest(range(n_chunks)) AS INT) AS chunk_id
  FROM ck_n
),
ck AS (
  SELECT doc_id, chunk_id, chunk_id * {st} AS chunk_start,
         tokens[chunk_id * {st} + 1 : chunk_id * {st} + {L}] AS chunk
  FROM ck_rows
)
SELECT doc_id, chunk_id, chunk_start,
       {G.asize('chunk', D)} AS chunk_len,
       {G.afold('chunk', f'(acc * 31 + x) % {FINGERPRINT_MOD}', D)} AS chunk_fp
FROM ck
"""


def pack_chunk_sql() -> str:
    """Tagged union of sequence packing and overlapping-stride chunking
    (r05 consolidation): both legs are the unchanged single-operator
    oracles; sentinels ('' / -1) keep the union null-free."""
    return f"""
WITH pk AS ({pack_sequences_sql()}),
ck AS ({chunk_sequences_sql()})
SELECT 'pack' AS part, doc_id, source, tok_offset, bin_start, bin_end,
       CAST(-1 AS INT) AS chunk_id, CAST(-1 AS INT) AS chunk_start,
       CAST(-1 AS INT) AS chunk_len, CAST(-1 AS BIGINT) AS chunk_fp
FROM pk
UNION ALL
SELECT 'chunk' AS part, doc_id, '' AS source,
       CAST(-1 AS BIGINT) AS tok_offset, CAST(-1 AS BIGINT) AS bin_start,
       CAST(-1 AS BIGINT) AS bin_end, chunk_id, chunk_start, chunk_len,
       chunk_fp
FROM ck
"""


def encode_embeddings_roundtrip_sql() -> str:
    # sequential-fold fingerprint over the float32 elements, every step an
    # exact widening + one IEEE op — the cosine_expr discipline
    return """
SELECT vec_id,
       COALESCE(CAST(len(embedding) AS INTEGER), -1) AS dim,
       COALESCE(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), embedding),
                   (acc, x) -> acc / CAST(2.0 AS DOUBLE) + x),
                -999.0) AS emb_fp,
       CASE WHEN len(embedding) > 0 THEN CAST(embedding[1] AS DOUBLE)
            ELSE -999.0 END AS e_first,
       CASE WHEN len(embedding) > 0
            THEN CAST(embedding[len(embedding)] AS DOUBLE)
            ELSE -999.0 END AS e_last
FROM embeddings
"""


def dataset_compact_roundtrip_sql() -> str:
    # two maintenance-rewrite legs, each row-identical to the raw table:
    # compaction (concatenates immutable blocks) and reclustering (decode
    # -> globally sorted staging -> re-encode) -- one raw projection per leg
    return """
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem
"""


def dataset_column_stats_sql() -> str:
    # zone-map extrema must equal the raw table's exact min/max; the r05
    # aggregate-pushdown legs (n_rows / n_nonnull / sum_i) must equal the
    # raw table's count(*) / count(col) / sum(col) — float columns push no
    # sum (sentinel -1 on both sides)
    def row(col, is_int):
        agg = (
            "CAST(count(*) AS BIGINT) AS n_rows, "
            f"CAST(count({col}) AS BIGINT) AS n_nonnull, "
            + (
                f"CAST(sum({col}) AS BIGINT) AS sum_i"
                if is_int
                else "CAST(-1 AS BIGINT) AS sum_i"
            )
        )
        if is_int:
            return (
                f"SELECT '{col}' AS column, CAST(min({col}) AS BIGINT) AS vmin_i, "
                f"CAST(max({col}) AS BIGINT) AS vmax_i, -1.0 AS vmin_d, "
                f"-1.0 AS vmax_d, CAST(0 AS BIGINT) AS n_unstated, {agg} FROM lineitem"
            )
        return (
            f"SELECT '{col}' AS column, CAST(-1 AS BIGINT) AS vmin_i, "
            f"CAST(-1 AS BIGINT) AS vmax_i, min({col}) AS vmin_d, "
            f"max({col}) AS vmax_d, CAST(0 AS BIGINT) AS n_unstated, {agg} FROM lineitem"
        )

    def str_row(col):
        # string columns: no numeric extrema, no sum; counts still exact
        return (
            f"SELECT '{col}' AS column, CAST(-1 AS BIGINT) AS vmin_i, "
            f"CAST(-1 AS BIGINT) AS vmax_i, -1.0 AS vmin_d, -1.0 AS vmax_d, "
            f"CAST(0 AS BIGINT) AS n_unstated, "
            f"CAST(count(*) AS BIGINT) AS n_rows, "
            f"CAST(count({col}) AS BIGINT) AS n_nonnull, "
            f"CAST(-1 AS BIGINT) AS sum_i FROM lineitem"
        )

    def where_row(label, cond, agg_expr=None):
        # the count_where legs: the oracle recounts (and re-aggregates) the
        # predicate from the raw table -- a wrong interior claim, a stale
        # null count, a bad stored zsum, or an unsound zone extremum all
        # mismatch. MIN/MAX ride the vmin_i/vmax_i columns.
        if agg_expr:
            s = f"COALESCE(CAST(sum({agg_expr}) AS BIGINT), -1)"
            mn = f"COALESCE(CAST(min({agg_expr}) AS BIGINT), -1)"
            mx = f"COALESCE(CAST(max({agg_expr}) AS BIGINT), -1)"
        else:
            s = mn = mx = "CAST(-1 AS BIGINT)"
        return (
            f"SELECT '{label}' AS column, {mn} AS vmin_i, "
            f"{mx} AS vmax_i, -1.0 AS vmin_d, -1.0 AS vmax_d, "
            f"CAST(0 AS BIGINT) AS n_unstated, "
            f"CAST(count(*) AS BIGINT) AS n_rows, "
            f"CAST(-1 AS BIGINT) AS n_nonnull, "
            f"{s} AS sum_i FROM lineitem WHERE {cond}"
        )

    def group_row(prefix, col, cond=None):
        # the group_count legs: the oracle re-groups the raw table; a
        # miscounted dictionary slot, a dropped RLE run, or a lost NULL
        # group all hash-mismatch. cond gates the FILTERED variant
        # (group_count(where=)): SQL's WHERE-before-GROUP-BY, so a group
        # with no matching row is absent on both sides
        wh = f" WHERE {cond}" if cond else ""
        return (
            f"SELECT '{prefix}' || COALESCE(CAST({col} AS VARCHAR), '<null>') "
            f"AS column, CAST(-1 AS BIGINT) AS vmin_i, "
            f"CAST(-1 AS BIGINT) AS vmax_i, -1.0 AS vmin_d, -1.0 AS vmax_d, "
            f"CAST(0 AS BIGINT) AS n_unstated, "
            f"CAST(count(*) AS BIGINT) AS n_rows, "
            f"CAST(-1 AS BIGINT) AS n_nonnull, "
            f"CAST(-1 AS BIGINT) AS sum_i FROM lineitem{wh} GROUP BY {col}"
        )

    def gsum_row(prefix, key, agg, cond=None, agg_expr=None):
        # the group_sum legs: grouped COUNT + exact SUM re-aggregated from
        # the raw table (DuckDB SUM(BIGINT) is HUGEINT — cast back; the
        # testdata totals fit int64, and the engine REFUSES when they
        # don't, so a cast overflow here would itself flag the mismatch).
        # cond gates the FILTERED variant (group_sum(where=)): SQL's
        # WHERE-before-GROUP-BY, so a group with no matching row is
        # absent on both sides. agg_expr overrides the SUMMED expression
        # only (the gssq legs square through HUGEINT); extrema/counts stay
        # on the raw column
        wh = f" WHERE {cond}" if cond else ""
        sum_arg = agg_expr or agg
        return (
            f"SELECT '{prefix}' || COALESCE(CAST({key} AS VARCHAR), '<null>') "
            f"AS column, "
            f"CAST(COALESCE(MIN({agg}), -1) AS BIGINT) AS vmin_i, "
            f"CAST(COALESCE(MAX({agg}), -1) AS BIGINT) AS vmax_i, "
            f"-1.0 AS vmin_d, -1.0 AS vmax_d, "
            f"CAST(0 AS BIGINT) AS n_unstated, "
            f"CAST(count(*) AS BIGINT) AS n_rows, "
            f"CAST(count({agg}) AS BIGINT) AS n_nonnull, "
            f"CAST(COALESCE(SUM({sum_arg}), -1) AS BIGINT) AS sum_i "
            f"FROM lineitem{wh} GROUP BY {key}"
        )

    def topk_row(label, col, kk, direction, as_label, cond=None):
        # int top-k rides vmin_i, string top-k rides the label itself
        # (duplicates keep their multiplicity on both sides)
        sel = (
            f"'{label}' || v AS column, CAST(-1 AS BIGINT) AS vmin_i"
            if as_label
            else f"'{label}' AS column, CAST(v AS BIGINT) AS vmin_i"
        )
        return (
            f"SELECT {sel}, "
            f"CAST(-1 AS BIGINT) AS vmax_i, -1.0 AS vmin_d, -1.0 AS vmax_d, "
            f"CAST(0 AS BIGINT) AS n_unstated, "
            f"CAST(-1 AS BIGINT) AS n_rows, "
            f"CAST(-1 AS BIGINT) AS n_nonnull, "
            f"CAST(-1 AS BIGINT) AS sum_i FROM ("
            f"SELECT {col} AS v FROM lineitem WHERE {col} IS NOT NULL"
            + (f" AND {cond}" if cond else "")
            + f" ORDER BY v {direction} LIMIT {kk})"
        )

    return "\nUNION ALL\n".join(
        [
            row("l_orderkey", True),
            row("l_linenumber", True),
            row("l_quantity", False),
            row("l_discount", False),
            str_row("l_returnflag"),
            # the temporal column's zone stats are epoch-micros ints; no
            # sum (epoch magnitudes void the provable-exactness bound)
            "SELECT 'l_shipdate' AS column, "
            "CAST(date_diff('microsecond', TIMESTAMP '1970-01-01', "
            "min(l_shipdate)) AS BIGINT) AS vmin_i, "
            "CAST(date_diff('microsecond', TIMESTAMP '1970-01-01', "
            "max(l_shipdate)) AS BIGINT) AS vmax_i, "
            "-1.0 AS vmin_d, -1.0 AS vmax_d, "
            "CAST(0 AS BIGINT) AS n_unstated, "
            "CAST(count(*) AS BIGINT) AS n_rows, "
            "CAST(count(l_shipdate) AS BIGINT) AS n_nonnull, "
            "CAST(-1 AS BIGINT) AS sum_i FROM lineitem",
            where_row(
                "where:okey",
                "l_orderkey BETWEEN 1000 AND 30000",
                agg_expr="l_linenumber",
            ),
            where_row(
                "where:flag_qty",
                "l_returnflag BETWEEN 'A' AND 'N' "
                "AND l_quantity BETWEEN 5.0 AND 30.0",
            ),
            where_row(
                "where:open",
                "l_orderkey >= 9000",
                agg_expr="l_orderkey",
            ),
            where_row(
                "where:ship",
                "l_shipdate BETWEEN TIMESTAMP '1997-01-01' "
                "AND TIMESTAMP '1998-12-31'",
                agg_expr="l_orderkey",
            ),
            # the time-bucket rollup (180-day buckets over epoch micros;
            # ticks are non-negative here, so truncating // equals floor)
            "SELECT 'tbucket:' || CAST(b AS VARCHAR) AS column, "
            "CAST(b * 15552000000000 AS BIGINT) AS vmin_i, "
            "CAST(-1 AS BIGINT) AS vmax_i, -1.0 AS vmin_d, -1.0 AS vmax_d, "
            "CAST(0 AS BIGINT) AS n_unstated, "
            "CAST(count(*) AS BIGINT) AS n_rows, "
            "CAST(-1 AS BIGINT) AS n_nonnull, CAST(-1 AS BIGINT) AS sum_i "
            "FROM (SELECT date_diff('microsecond', TIMESTAMP '1970-01-01', "
            "l_shipdate) // 15552000000000 AS b FROM lineitem) GROUP BY b",
            where_row(
                "where:flag_in",
                "l_returnflag IN ('A', 'R') AND l_linenumber IN (1, 3, 5)",
                agg_expr="l_orderkey",
            ),
            # the DNF legs (any_of): SQL OR re-filtered from the raw table
            # -- an unsound OR-prune, a bad full-rows interior claim, or a
            # mis-OR'd boundary mask all hash-mismatch
            where_row(
                "wor:okey",
                "l_orderkey <= 5000 OR l_orderkey >= 25000",
                agg_expr="l_linenumber",
            ),
            where_row(
                "wor:mixed",
                "l_returnflag = 'A' OR l_quantity <= 10.0",
            ),
            where_row(
                "wor:ship",
                "l_shipdate BETWEEN TIMESTAMP '1995-01-01' "
                "AND TIMESTAMP '1996-01-01' "
                "OR l_shipdate BETWEEN TIMESTAMP '1998-01-01' "
                "AND TIMESTAMP '1999-01-01'",
                agg_expr="l_orderkey",
            ),
            group_row("group:flag=", "l_returnflag"),
            group_row("group:line=", "l_linenumber"),
            gsum_row("gsum:flag=", "l_returnflag", "l_orderkey"),
            gsum_row("gsum:line=", "l_linenumber", "l_orderkey"),
            gsum_row(
                "gwhere:flag=", "l_returnflag", "l_linenumber",
                cond="l_orderkey BETWEEN 1000 AND 30000",
            ),
            gsum_row(
                "gwhere:line=", "l_linenumber", "l_orderkey",
                cond="l_returnflag BETWEEN 'A' AND 'N' "
                     "AND l_quantity BETWEEN 5.0 AND 30.0",
            ),
            group_row(
                "gcwhere:flag=", "l_returnflag",
                cond="l_orderkey BETWEEN 1000 AND 30000",
            ),
            group_row(
                "gcwhere:line=", "l_linenumber",
                cond="l_returnflag BETWEEN 'A' AND 'N' "
                     "AND l_quantity BETWEEN 5.0 AND 30.0",
            ),
            gsum_row(
                "ginwhere:flag=", "l_returnflag", "l_orderkey",
                cond="l_linenumber IN (1, 2, 4)",
            ),
            gsum_row(
                "gwor:flag=", "l_returnflag", "l_orderkey",
                cond="l_orderkey <= 5000 OR l_orderkey >= 25000",
            ),
            # group_aggs legs: the engine computes both columns in one
            # pass; the oracle re-aggregates each separately
            gsum_row("gaggs:l_orderkey:", "l_returnflag", "l_orderkey"),
            gsum_row("gaggs:l_linenumber:", "l_returnflag", "l_linenumber"),
            # the sum-of-squares legs (group_aggs with_sum_sq, SAME pass):
            # the oracle squares through HUGEINT — the engine's exact
            # hi/lo fold of int64 squares must match it bit-for-bit
            gsum_row(
                "gssq:l_orderkey:", "l_returnflag", "l_orderkey",
                agg_expr="CAST(l_orderkey AS HUGEINT) * l_orderkey",
            ),
            gsum_row(
                "gssq:l_linenumber:", "l_returnflag", "l_linenumber",
                agg_expr="CAST(l_linenumber AS HUGEINT) * l_linenumber",
            ),
            # the top_k legs: the oracle re-sorts the raw table, so a
            # wrong zone skip, a lost duplicate, or a NULL in the ranks
            # all hash-mismatch; strings carry the value in the label
            topk_row("topk:okey", "l_orderkey", 7, "DESC", as_label=False),
            topk_row("topk:line", "l_linenumber", 5, "ASC", as_label=False),
            topk_row("topk:flag=", "l_returnflag", 6, "DESC", as_label=True),
            topk_row(
                "topkw:okey", "l_orderkey", 9, "DESC", as_label=False,
                cond="l_returnflag BETWEEN 'A' AND 'N' "
                     "AND l_linenumber IN (1, 2)",
            ),
            # the top_k_rows leg: RANK() <= k with ties included — the
            # oracle re-ranks the raw table with a window function and
            # fingerprints the identical row set
            "SELECT 'topkrows:okey' AS column, "
            "CAST(min(v) AS BIGINT) AS vmin_i, "
            "CAST(max(v) AS BIGINT) AS vmax_i, "
            "-1.0 AS vmin_d, -1.0 AS vmax_d, "
            "CAST(0 AS BIGINT) AS n_unstated, "
            "CAST(count(*) AS BIGINT) AS n_rows, "
            "CAST(count(a) AS BIGINT) AS n_nonnull, "
            "CAST(sum(a) AS BIGINT) AS sum_i FROM ("
            "SELECT l_orderkey AS v, l_linenumber AS a, "
            "RANK() OVER (ORDER BY l_orderkey DESC) AS r "
            "FROM lineitem WHERE l_orderkey IS NOT NULL) WHERE r <= 50",
        ]
        # the value_histogram legs: one row per NON-EMPTY bucket; the
        # bucket expression is the engine's exact integer arithmetic with
        # the intermediate product widened to HUGEINT (the engine folds in
        # python ints, which never overflow)
        + [
            "SELECT 'hist:okey=' || CAST(CAST((CAST(v AS HUGEINT) - lo) * 8 "
            "// (hi - lo + 1) AS BIGINT) AS VARCHAR) AS column, "
            "CAST(-1 AS BIGINT) AS vmin_i, CAST(-1 AS BIGINT) AS vmax_i, "
            "-1.0 AS vmin_d, -1.0 AS vmax_d, CAST(0 AS BIGINT) AS n_unstated, "
            "CAST(count(*) AS BIGINT) AS n_rows, "
            "CAST(-1 AS BIGINT) AS n_nonnull, CAST(-1 AS BIGINT) AS sum_i "
            "FROM (SELECT l_orderkey AS v FROM lineitem "
            "WHERE l_orderkey IS NOT NULL), "
            "(SELECT CAST(min(l_orderkey) AS HUGEINT) AS lo, "
            "CAST(max(l_orderkey) AS HUGEINT) AS hi FROM lineitem) "
            "GROUP BY 1"
        ]
        # the filtered-quantile legs: same ceil-division rank, population
        # restricted by the predicate on both sides
        + [
            f"SELECT 'quantw:line={q}' AS column, "
            f"CAST((SELECT min(v) FROM ("
            f"SELECT l_linenumber AS v, "
            f"sum(count(*)) OVER (ORDER BY l_linenumber) AS cum "
            f"FROM lineitem WHERE l_linenumber IS NOT NULL "
            f"AND l_returnflag IN ('A', 'R') "
            f"GROUP BY l_linenumber) "
            f"WHERE cum >= greatest(1, ({q} * ("
            f"SELECT count(l_linenumber) FROM lineitem "
            f"WHERE l_returnflag IN ('A', 'R')) + 999) // 1000)"
            f") AS BIGINT) AS vmin_i, "
            f"CAST(-1 AS BIGINT) AS vmax_i, -1.0 AS vmin_d, -1.0 AS vmax_d, "
            f"CAST(0 AS BIGINT) AS n_unstated, "
            f"CAST(-1 AS BIGINT) AS n_rows, "
            f"CAST(-1 AS BIGINT) AS n_nonnull, "
            f"CAST(-1 AS BIGINT) AS sum_i"
            for q in (0, 500, 1000)
        ]
        # the composite-key group_count leg: re-grouped on both keys
        + [
            "SELECT 'gc2:' || COALESCE(CAST(l_returnflag AS VARCHAR), "
            "'<null>') || ',' || COALESCE(CAST(l_linenumber AS VARCHAR), "
            "'<null>') AS column, "
            "CAST(-1 AS BIGINT) AS vmin_i, CAST(-1 AS BIGINT) AS vmax_i, "
            "-1.0 AS vmin_d, -1.0 AS vmax_d, CAST(0 AS BIGINT) AS n_unstated, "
            "CAST(count(*) AS BIGINT) AS n_rows, "
            "CAST(-1 AS BIGINT) AS n_nonnull, CAST(-1 AS BIGINT) AS sum_i "
            "FROM lineitem GROUP BY l_returnflag, l_linenumber"
        ]
        # the composite-key group_aggs leg
        + [
            "SELECT 'ga2:' || COALESCE(CAST(l_returnflag AS VARCHAR), "
            "'<null>') || ',' || COALESCE(CAST(l_linenumber AS VARCHAR), "
            "'<null>') AS column, "
            "CAST(COALESCE(MIN(l_orderkey), -1) AS BIGINT) AS vmin_i, "
            "CAST(COALESCE(MAX(l_orderkey), -1) AS BIGINT) AS vmax_i, "
            "-1.0 AS vmin_d, -1.0 AS vmax_d, CAST(0 AS BIGINT) AS n_unstated, "
            "CAST(count(*) AS BIGINT) AS n_rows, "
            "CAST(count(l_orderkey) AS BIGINT) AS n_nonnull, "
            "CAST(COALESCE(SUM(l_orderkey), -1) AS BIGINT) AS sum_i "
            "FROM lineitem GROUP BY l_returnflag, l_linenumber"
        ]
        # the group_distinct_est leg: the oracle reproduces the portable
        # quadratic hash, the per-group k-min window, and the integer
        # estimate bit-for-bit (KMV beats HLL here exactly because the
        # estimate is engine-portable)
        + [
            "SELECT 'gkmv:flag=' || COALESCE(CAST(src AS VARCHAR), '<null>') "
            "AS column, "
            f"CAST({G.kmv_estimate_expr('n_h', 'h_k', 64, D)} AS BIGINT) "
            "AS vmin_i, "
            "CAST(-1 AS BIGINT) AS vmax_i, -1.0 AS vmin_d, -1.0 AS vmax_d, "
            "CAST(0 AS BIGINT) AS n_unstated, CAST(-1 AS BIGINT) AS n_rows, "
            "CAST(-1 AS BIGINT) AS n_nonnull, CAST(-1 AS BIGINT) AS sum_i "
            "FROM ("
            "SELECT src, count(*) AS n_h, max(h) AS h_k FROM ("
            "SELECT src, h, row_number() OVER "
            "(PARTITION BY src ORDER BY h) AS rn FROM ("
            "SELECT DISTINCT l_returnflag AS src, "
            f"{G.kmv_hash_expr('l_orderkey', D)} AS h "
            "FROM lineitem WHERE l_orderkey IS NOT NULL)"
            ") WHERE rn <= 64 GROUP BY src)"
        ]
        # the group_distinct leg: the EXACT twin -- the oracle recomputes
        # count(DISTINCT) from the raw table, so a dropped pair, a
        # double-counted dictionary slot, or a lost NULL-key group all
        # hash-mismatch
        + [
            "SELECT 'gdx:flag=' || COALESCE(CAST(l_returnflag AS VARCHAR), "
            "'<null>') AS column, "
            "CAST(count(DISTINCT l_linenumber) AS BIGINT) AS vmin_i, "
            "CAST(-1 AS BIGINT) AS vmax_i, -1.0 AS vmin_d, -1.0 AS vmax_d, "
            "CAST(0 AS BIGINT) AS n_unstated, CAST(-1 AS BIGINT) AS n_rows, "
            "CAST(-1 AS BIGINT) AS n_nonnull, CAST(-1 AS BIGINT) AS sum_i "
            "FROM lineitem GROUP BY l_returnflag"
        ]
        # the exact_quantiles legs: one row per milli-quantile, the rank
        # recomputed with integer ceil division over a cumulative window —
        # the identical arithmetic the engine uses, so no float rank can
        # drift between engines
        + [
            f"SELECT 'quant:okey={q}' AS column, "
            f"CAST((SELECT min(v) FROM ("
            f"SELECT l_orderkey AS v, "
            f"sum(count(*)) OVER (ORDER BY l_orderkey) AS cum "
            f"FROM lineitem WHERE l_orderkey IS NOT NULL "
            f"GROUP BY l_orderkey) "
            f"WHERE cum >= greatest(1, ({q} * ("
            f"SELECT count(l_orderkey) FROM lineitem) + 999) // 1000)"
            f") AS BIGINT) AS vmin_i, "
            f"CAST(-1 AS BIGINT) AS vmax_i, -1.0 AS vmin_d, -1.0 AS vmax_d, "
            f"CAST(0 AS BIGINT) AS n_unstated, "
            f"CAST(-1 AS BIGINT) AS n_rows, "
            f"CAST(-1 AS BIGINT) AS n_nonnull, "
            f"CAST(-1 AS BIGINT) AS sum_i"
            for q in (0, 250, 500, 750, 1000)
        ]
    )


def stratified_sample_sql() -> str:
    bucket = G.sample_hash_expr("doc_id", D)
    return f"""
SELECT doc_id, source, n_chars
FROM documents
WHERE {bucket} < CASE source WHEN 'src0' THEN 500 WHEN 'src1' THEN 200
                             WHEN 'src2' THEN 1000 ELSE 100 END
"""


def deterministic_split_sql() -> str:
    # ranges walk the splits in sorted-name order (test, train, val), the
    # same rule sampling.deterministic_split applies
    bucket = G.sample_hash_expr("doc_id", D)
    return f"""
WITH b AS (SELECT doc_id, source, {bucket} AS bk FROM documents)
SELECT doc_id, source,
       CASE WHEN bk < 100 THEN 'test'
            WHEN bk < 900 THEN 'train'
            ELSE 'val' END AS split
FROM b
"""


def mixture_sample_sql(weights_milli: dict[str, int] | None = None) -> str:
    """Oracle twin of sampling.mixture_sample: the target-mixture
    fractions are recomputed from the SAME corpus counts with the same
    non-negative integer floor divisions (DuckDB ``//`` truncates toward
    zero, == floor for non-negatives), then the same bucket predicate."""
    weights_milli = weights_milli or {"src0": 600, "src1": 300, "src2": 100}
    vals = ", ".join(f"('{s}', {int(w)})" for s, w in sorted(weights_milli.items()))
    bucket = G.sample_hash_expr("d.doc_id", D)
    return f"""
WITH w(source, w_milli) AS (VALUES {vals}),
c AS (SELECT d.source, COUNT(*) AS n FROM documents d
      JOIN w ON d.source = w.source GROUP BY d.source),
t AS (SELECT MIN((c.n * {G.SAMPLE_MOD}) // w.w_milli) AS tot
      FROM c JOIN w ON c.source = w.source),
f AS (SELECT w.source, ((SELECT tot FROM t) * w.w_milli) // c.n AS f_milli
      FROM w JOIN c ON w.source = c.source)
SELECT d.doc_id, d.source, f.f_milli
FROM documents d JOIN f ON d.source = f.source
WHERE {bucket} < f.f_milli
"""


def shuffle_order_sql(n_shards: int = 8) -> str:
    """Oracle twin of sampling.shuffle_order: same shuffle-hash, same
    shard mod, same (hash, id) rank within each shard."""
    rh = G.shuffle_hash_expr("doc_id", D)
    return f"""
WITH h AS (SELECT doc_id, source, {rh} AS rh FROM documents)
SELECT doc_id, source, CAST(rh % {int(n_shards)} AS INT) AS shard,
       CAST(row_number() OVER (
           PARTITION BY rh % {int(n_shards)} ORDER BY rh, doc_id
       ) - 1 AS BIGINT) AS pos
FROM h
"""


def cosine_topk_batch_sql(k: int = 5) -> str:
    cos = G.cosine_expr("e.embedding", "q.qv", D)
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id IN (0, 1, 2, 3)),
s AS (SELECT q.query_id, e.vec_id, {cos} AS cosine
      FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
r AS (SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn FROM s)
SELECT query_id, vec_id, cosine FROM r WHERE rn <= {k}
"""


def parse_scalars_sql() -> str:
    """Twin of __spark_entry__.q_parse_scalars: the reference's 12-token
    case-insensitive boolean vocabulary with full-ASCII-whitespace trim
    (xml_parser.rs:158-182) and strict/try integer parsing
    (xml_parser.rs:200-240) over derived string columns."""
    ws = "' ' || chr(9) || chr(13) || chr(10) || chr(11) || chr(12)"
    vocab = (
        "list_value(' true', 'FALSE', 'Yes', '  no', 'on' || chr(9), "
        "' OFF ', 'T', 'f', 'Y', 'n', '1', '0', 'maybe', '')"
    )
    return f"""
WITH t AS (
  SELECT l_orderkey, l_linenumber,
         ({vocab})[CAST((l_orderkey + l_linenumber) % 14 + 1 AS INTEGER)] AS btok,
         CAST(l_orderkey % 100000 AS VARCHAR) AS numstr
  FROM lineitem
), w AS (
  SELECT *, lower(trim(btok, {ws})) AS b FROM t
)
SELECT l_orderkey, l_linenumber,
       COALESCE(CASE WHEN b IN ('true', '1', 'yes', 'on', 't', 'y') THEN 1
                     WHEN b IN ('false', '0', 'no', 'off', 'f', 'n') THEN 0
                END, -1) AS bool_flag,
       CAST(trim('  ' || numstr || ' ', {ws}) AS INTEGER) AS n_parsed,
       COALESCE(TRY_CAST(trim(
           CASE WHEN (l_orderkey + l_linenumber) % 5 = 0
                THEN numstr || 'x' ELSE numstr END, {ws}) AS INTEGER),
           -1) AS n_try
FROM w
"""


def encode_types_composite_sql() -> str:
    """One row per lineitem PK carrying all four typed round-trip
    contracts (r05 registry consolidation — VERDICT r04 #1): the presort
    multiset (raw projection; the in-task permutation must preserve it),
    float32 bit-parity (correctly-rounded REAL cast then the exact
    REAL->DOUBLE widening), the uint64/decimal(20,0) +2^63 digit
    string, and the temporal epoch projection (timestamp micros + date32
    days — tz-free date_diff arithmetic on both sides). A tagged UNION, not a join — (l_orderkey, l_linenumber) is
    not unique in the synthetic lineitem — with the same null-free
    sentinels as the Spark side. Each leg is the UNCHANGED single-operator
    oracle as a CTE: one source of truth per contract, no inline
    re-implementation to drift."""
    return f"""
WITH pre AS ({encode_presort_roundtrip_sql()}),
f32 AS ({encode_float32_roundtrip_sql()}),
u64 AS ({encode_uint64_roundtrip_sql()}),
tmp AS (
  SELECT l_orderkey, l_linenumber,
         CAST(date_diff('microsecond', TIMESTAMP '1970-01-01',
                        l_shipdate) AS BIGINT) AS ship_us,
         CAST(date_diff('day', DATE '1970-01-01',
                        CAST(l_shipdate AS DATE)) AS BIGINT) AS ship_epoch_day
  FROM lineitem
)
SELECT 'presort' AS part, l_orderkey, l_linenumber,
       l_returnflag, l_linestatus, l_quantity,
       -1.0 AS qty_f, -1.0 AS disc_f, '' AS big_id_str,
       CAST(-1 AS BIGINT) AS ship_us, CAST(-1 AS BIGINT) AS ship_epoch_day
FROM pre
UNION ALL
SELECT 'f32' AS part, l_orderkey, l_linenumber,
       '' AS l_returnflag, '' AS l_linestatus, -1.0 AS l_quantity,
       qty_f, disc_f, '' AS big_id_str,
       CAST(-1 AS BIGINT) AS ship_us, CAST(-1 AS BIGINT) AS ship_epoch_day
FROM f32
UNION ALL
SELECT 'u64' AS part, l_orderkey, l_linenumber,
       '' AS l_returnflag, '' AS l_linestatus, -1.0 AS l_quantity,
       -1.0 AS qty_f, -1.0 AS disc_f, big_id_str,
       CAST(-1 AS BIGINT) AS ship_us, CAST(-1 AS BIGINT) AS ship_epoch_day
FROM u64
UNION ALL
SELECT 'temporal' AS part, l_orderkey, l_linenumber,
       '' AS l_returnflag, '' AS l_linestatus, -1.0 AS l_quantity,
       -1.0 AS qty_f, -1.0 AS disc_f, '' AS big_id_str,
       ship_us, ship_epoch_day
FROM tmp
"""


def paragraph_dedup_sql(para_words: int = 8, max_df: int = 2) -> str:
    """Oracle twin of textstats.paragraph_dedup: segment the word stream
    into ``para_words``-word paragraphs, drop those appearing in more than
    ``max_df`` distinct docs, reassemble in order, and fingerprint the
    cleaned text with the shared rolling-hash fold. All-positive integer
    arithmetic only, so DuckDB's truncating ``//`` equals floor."""
    pw = int(para_words)
    fold = G.afold(
        G.word_tokens_arr("clean_text", D), f"(acc * 31 + x) % {FINGERPRINT_MOD}", D
    )
    return f"""
WITH pd_base AS (
  SELECT doc_id, string_split(text, ' ') AS words FROM documents
),
pd_segs AS (
  SELECT doc_id, CAST(unnest(range((len(words) + {pw - 1}) // {pw})) AS INT) AS seg,
         words
  FROM pd_base
),
pd_paras AS (
  SELECT doc_id, seg,
         array_to_string(words[seg * {pw} + 1 : seg * {pw} + {pw}], ' ') AS para
  FROM pd_segs
),
pd_freq AS (
  SELECT para FROM pd_paras GROUP BY para HAVING COUNT(DISTINCT doc_id) > {max_df}
),
pd_kept AS (
  SELECT doc_id, seg, para FROM pd_paras
  WHERE para NOT IN (SELECT para FROM pd_freq)
),
pd_tot AS (
  SELECT doc_id, COUNT(*) AS n_paras FROM pd_paras GROUP BY doc_id
),
pd_agg AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         string_agg(para, ' ' ORDER BY seg) AS clean_text
  FROM pd_kept GROUP BY doc_id
),
pd_out AS (
  SELECT t.doc_id, t.n_paras,
         COALESCE(a.n_kept, 0) AS n_kept,
         COALESCE(a.clean_text, '') AS clean_text
  FROM pd_tot t LEFT JOIN pd_agg a USING (doc_id)
)
SELECT doc_id, n_paras, n_kept,
       CAST(length(clean_text) AS INT) AS clean_len,
       {fold} AS clean_fp
FROM pd_out
"""


def text_analysis_sql() -> str:
    """Doc-level text-analysis suite in one gated row (r05 consolidation):
    lang-id hits + prediction, quality stats, token counts, repeated-ngram
    stats, the rolling-hash fingerprint, and the paragraph-dedup summary
    (counts + cleaned-text fingerprint), joined on doc_id. Each leg is
    the UNCHANGED single-operator oracle as a CTE, so per-operator
    coverage is preserved bit-for-bit."""
    langs = list(STOPWORDS)
    hit_cols = ", ".join(f"la.hits_{lang}" for lang in langs)
    return f"""
WITH la AS ({lang_id_sql()}),
tq AS ({text_quality_sql()}),
tc AS ({token_counts_sql()}),
rn AS ({repeated_ngrams_sql()}),
fp AS ({doc_fingerprint_sql()}),
pd AS ({paragraph_dedup_sql(3, 4)})
SELECT la.doc_id, {hit_cols}, la.predicted_lang,
       tq.n_words, tq.n_distinct_words, tq.n_chars, tq.n_punct,
       tq.max_word_len, tq.distinct_ratio,
       tc.ws_tokens, tc.bpe_tokens,
       rn.total_ngrams, rn.distinct_ngrams, rn.repeat_ratio,
       fp.fingerprint,
       pd.n_paras, pd.n_kept, pd.clean_len, pd.clean_fp
FROM la
JOIN tq ON la.doc_id = tq.doc_id
JOIN tc ON la.doc_id = tc.doc_id
JOIN rn ON la.doc_id = rn.doc_id
JOIN fp ON la.doc_id = fp.doc_id
JOIN pd ON la.doc_id = pd.doc_id
"""


def simhash_full_sql() -> str:
    """Per-doc simhash joined with its group's keeper + size (r05
    consolidation of simhash + simhash_groups): pins every per-doc hash
    AND the group reduction in one row set. Both legs are the UNCHANGED
    single-operator oracles as CTEs."""
    return f"""
WITH s AS ({simhash_sql()}),
g AS ({simhash_groups_sql()})
SELECT s.doc_id, s.simhash, g.keep_doc_id, g.n_docs
FROM s JOIN g ON s.simhash = g.simhash
"""


def sample_split_sql() -> str:
    """Tagged union of the deterministic sampler, splitter, target-mixture
    resampler, and corpus shuffler (r05 consolidation): every leg is the
    unchanged single-operator oracle; sentinels ('' split / -1 n_chars /
    -1 aux) keep the union null-free per the driver canonicalizer
    contract. ``aux`` is the per-leg evidence integer: the applied
    f_milli for the mixture leg, shard*100000+pos (injective — pos is
    bounded by the shard size, far below 100000 at any parity sf) for the
    order leg."""
    return f"""
WITH sa AS ({stratified_sample_sql()}),
sp AS ({deterministic_split_sql()}),
mx AS ({mixture_sample_sql()}),
so AS ({shuffle_order_sql()})
SELECT 'sample' AS part, doc_id, source, n_chars, '' AS split,
       CAST(-1 AS BIGINT) AS aux FROM sa
UNION ALL
SELECT 'split' AS part, doc_id, source, -1 AS n_chars, split,
       CAST(-1 AS BIGINT) AS aux FROM sp
UNION ALL
SELECT 'mixture' AS part, doc_id, source, -1 AS n_chars, '' AS split,
       CAST(f_milli AS BIGINT) AS aux FROM mx
UNION ALL
SELECT 'order' AS part, doc_id, source, -1 AS n_chars, '' AS split,
       CAST(shard AS BIGINT) * 100000 + pos AS aux FROM so
"""


def cosine_topk_all_sql() -> str:
    """Tagged union of the single-query (k=10) and batch (4 queries, k=5)
    exact cosine verifiers (r05 consolidation)."""
    return f"""
WITH s AS ({cosine_topk_sql()}),
b AS ({cosine_topk_batch_sql()})
SELECT 'single' AS variant, CAST(0 AS BIGINT) AS query_id, vec_id, cosine
FROM s
UNION ALL
SELECT 'batch' AS variant, CAST(query_id AS BIGINT) AS query_id, vec_id,
       cosine
FROM b
"""


def pii_scrub_sql() -> str:
    """Byte-for-byte twin of textstats.pii_scrub over the derived
    pii-bearing text: same RE2/Java-compatible patterns, same redaction
    order (email -> ipv4 -> phone), counts on the original text."""
    from xml2arrow_spark.pipeline.textstats import PII_PATTERNS

    derive = (
        "'mail ' || CAST(doc_id AS VARCHAR) || '@ex.com tel 555-123-' || "
        "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ip 10.1.2.' || "
        "CAST(doc_id % 256 AS VARCHAR) || ' :: ' || text"
    )
    scrub = "text"
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(
            G.asize(f"regexp_extract_all(text, '{pat}')", D) + f" AS n_{name}"
        )
        scrub = f"regexp_replace({scrub}, '{pat}', '{token}', 'g')"
    return f"""
WITH p AS (SELECT doc_id, {derive} AS text FROM documents)
SELECT doc_id, {scrub} AS scrubbed, {", ".join(counts)}
FROM p
"""


def normalize_text_sql() -> str:
    """Byte-for-byte twin of textstats.normalize_text over the derived
    control-char-bearing text: same strip class, same whitespace-run
    collapse, same trim ('g' flag — DuckDB replaces first-match-only by
    default, Spark replaces all)."""
    from xml2arrow_spark.pipeline.textstats import CONTROL_CLASS, WS_RUN

    derive = (
        "chr(CAST(1 + doc_id % 7 AS INT)) || 'x' || chr(9) || chr(9) || "
        "text || ' ' || chr(13) || chr(10) || chr(11) || chr(127)"
    )
    stripped = f"regexp_replace(text, '{CONTROL_CLASS}', '', 'g')"
    clean = f"trim(regexp_replace({stripped}, '{WS_RUN}', ' ', 'g'))"
    return f"""
WITH nz AS (SELECT doc_id, {derive} AS text FROM documents)
SELECT doc_id, {clean} AS clean,
       CAST(length(text) - length({stripped}) AS INT) AS n_control,
       CAST(length({clean}) AS INT) AS clean_len
FROM nz
"""


def pii_norm_sql() -> str:
    """Tagged union of PII redaction and control/whitespace normalization
    (r05 consolidation): both legs are the unchanged single-operator
    oracles over their derived dirty texts; sentinels keep the union
    null-free."""
    return f"""
WITH pl AS ({pii_scrub_sql()}),
nl AS ({normalize_text_sql()})
SELECT 'pii' AS part, doc_id, scrubbed AS text_out,
       n_email AS n_a, n_ipv4 AS n_b, n_phone AS n_c
FROM pl
UNION ALL
SELECT 'norm' AS part, doc_id, clean AS text_out,
       n_control AS n_a, clean_len AS n_b, CAST(-1 AS INT) AS n_c
FROM nl
"""


def encode_zonemap_sql() -> str:
    """Tagged union of both zone-map pruning legs (r05 consolidation);
    each leg is the unchanged single-operator oracle as a CTE."""
    return f"""
WITH a AS ({encode_zonemap_scan_sql()}),
b AS ({encode_zonemap_multi_sql()})
SELECT 'int' AS part, l_orderkey, l_linenumber, l_quantity,
       '' AS l_returnflag
FROM a
UNION ALL
SELECT 'multi' AS part, l_orderkey, l_linenumber, l_quantity, l_returnflag
FROM b
"""


def multimodal_pipeline_sql() -> str:
    """The three multimodal projections in one gated row set at frame
    grain (r05 consolidation): per-(doc, frame) window stats joined with
    the doc-level mime/metadata and the full feature vector. Each leg is
    the unchanged single-operator oracle as a CTE."""
    return f"""
WITH fr AS ({multimodal_frames_sql()}),
me AS ({multimodal_meta_sql()}),
fe AS ({multimodal_features_sql()})
SELECT fr.doc_id, fr.frame_idx, fr.frame_len, fr.frame_sum,
       me.mime, fe.n_bytes, fe.byte_sum, fe.head_hash,
       fe.feature_0, fe.feature_1, fe.feature_2, fe.feature_3,
       fe.feature_4, fe.feature_5, fe.feature_6, fe.feature_7
FROM fr
JOIN me ON fr.doc_id = me.doc_id
JOIN fe ON fr.doc_id = fe.doc_id
"""


def all_oracles() -> dict[str, str]:
    """48 entries, one per registry query, ordered to match
    ``__spark_entry__.queries()`` — the whole surface now fits inside the
    driver's 50-query check window (VERDICT r04 #1), with the
    never-driver-checked queries (embeddings roundtrip, resume, streaming
    encode, typed composite, multimodal) moved to the front."""
    return {
        "tokenize": tokenize_sql(),
        "encode_roundtrip": tokenize_sql(),
        "encode_embeddings_roundtrip": encode_embeddings_roundtrip_sql(),
        # resume + streaming decode back to the SAME token projection the
        # tokenize oracle recomputes — resumability/streaming must be
        # invisible to results. The resume gate then DELETES ids ending in
        # '7' from the completed dataset (r05 row-level delete) and then
        # UPSERTS a batch (replace '%3', insert '%9::v2'); the oracle
        # states the final row set over the raw projection
        "encode_dataset_resume": encode_dataset_resume_sql(),
        "streaming_encode": tokenize_sql(),
        "encode_types_composite": encode_types_composite_sql(),
        "multimodal_pipeline": multimodal_pipeline_sql(),
        # the general-entropy cascade must be invisible to results
        "encode_cascade_roundtrip": tokenize_sql(),
        "encode_metadata": encode_metadata_sql(),
        "codec_selection": codec_selection_sql(),
        "token_stats": token_stats_sql(),
        "work_buckets": work_buckets_sql(),
        "salted_source_stats": salted_source_stats_sql(),
        "dedup_exact": dedup_exact_sql(),
        "minhash_signatures": minhash_signatures_sql(),
        "lsh_near_dup_pairs": lsh_near_dup_pairs_sql(),
        "incremental_near_dup": incremental_near_dup_sql(),
        "contamination_hits": contamination_hits_sql(),
        "streaming_dedup": streaming_dedup_sql(),
        # r05 tiered variant: hot-state TTL eviction + archival store must
        # be invisible — same first-arrival winner set
        "streaming_dedup_tiered": streaming_dedup_sql(),
        # continuous ingestion must be invisible: the epochs' union equals
        # the batch full-corpus pair set
        "streaming_near_dup": lsh_near_dup_pairs_sql(),
        "dataset_wide_subset": dataset_wide_subset_sql(),
        "dataset_compact_roundtrip": dataset_compact_roundtrip_sql(),
        "dataset_column_stats": dataset_column_stats_sql(),
        "sample_split": sample_split_sql(),
        "cosine_topk_all": cosine_topk_all_sql(),
        "near_dup_resolve": near_dup_resolve_sql(),
        # r05 reliable-checkpoint path: storage mode invisible to results
        "near_dup_resolve_reliable": near_dup_resolve_sql(),
        "corpus_prep": corpus_prep_sql(),
        "simhash_full": simhash_full_sql(),
        "neighbor_jaccard": neighbor_jaccard_sql(),
        "text_analysis": text_analysis_sql(),
        "quality_filter": quality_filter_sql(),
        "pii_scrub": pii_norm_sql(),
        "tfidf_topk": tfidf_topk_sql(),
        "pack_sequences": pack_chunk_sql(),
        "lsh_ann_topk": lsh_ann_topk_sql(),
        "ivf_ann_topk": ivf_ann_topk_sql(),
        "embedding_near_dup": embedding_near_dup_sql(),
        "parse_scalars": parse_scalars_sql(),
        "unnest_orders": unnest_orders_sql(),
        "affine_transform": affine_transform_sql(),
        "sessionize": sessionize_sql(),
        # the stateful streaming twin must emit the SAME sessions
        "streaming_sessionize": sessionize_sql(),
        "event_type_stats": event_type_stats_sql(),
        "encode_typed_roundtrip": encode_typed_roundtrip_sql(),
        "encode_nullable_roundtrip": encode_nullable_roundtrip_sql(),
        "encode_fused_roundtrip": encode_fused_roundtrip_sql(),
        "encode_wide_subset": encode_wide_subset_sql(),
        "encode_zonemap": encode_zonemap_sql(),
    }
