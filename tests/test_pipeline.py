"""Training-pipeline operators: dedup, similarity, text analysis, multimodal.

Style mirrors the reference's exhaustive per-value assertions
(/root/reference/src/xml_parser.rs:1405-5868): tiny crafted inputs with
known-correct outputs, plus plan-shape guards for the scale-critical paths.
"""

import pyspark.sql.functions as F
import pytest

from xml2arrow_spark.pipeline import dedup, multimodal, similarity, textstats

DOCS_DDL = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in enumerate(rows)], DOCS_DDL
    )


# -- dedup ---------------------------------------------------------------------


def test_exact_dedup_counts(spark):
    df = _docs(spark, ["a b c d", "a b c d", "x y z w", "a b c d"])
    out = {r["keep_doc_id"]: r["n_copies"] for r in dedup.exact_dedup(df).collect()}
    assert out == {0: 3, 2: 1}


def test_lsh_finds_exact_and_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tomorrow")  # one word differs -> high jaccard
    other = "completely different words describing some unrelated topic entirely here now yes"
    df = _docs(spark, [base, base, near, other])
    pairs = {
        (r["doc_a"], r["doc_b"]): (r["inter_size"], r["union_size"])
        for r in dedup.lsh_near_dup_pairs(df, threshold_milli=700).collect()
    }
    assert (0, 1) in pairs  # exact dup
    inter, union = pairs[(0, 1)]
    assert inter == union  # jaccard exactly 1
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup survives banding
    assert all(3 not in p for p in pairs)  # unrelated doc never pairs


def test_lsh_short_docs_never_pair(spark):
    df = _docs(spark, ["ab", "ab", "cd"])  # < 3 words -> no shingles
    assert dedup.lsh_near_dup_pairs(df).count() == 0


def test_simhash_identical_and_order_sensitivity(spark):
    df = _docs(spark, ["alpha beta gamma delta", "alpha beta gamma delta"])
    h = [r["simhash"] for r in dedup.with_simhash(df).select("simhash").collect()]
    assert h[0] == h[1]
    assert 0 <= h[0] < 2**32


def test_simhash_groups_exact_dups(spark):
    df = _docs(spark, ["a b c", "a b c", "d e f"])
    groups = {r["keep_doc_id"]: r["n_docs"] for r in dedup.simhash_groups(df).collect()}
    assert groups[0] == 2


def test_neighbor_jaccard_pairs_neighbors(spark):
    df = _docs(spark, ["a b c", "a b d", "x y z"])  # ordered by n_chars,doc_id
    rows = dedup.neighbor_jaccard(df).collect()
    assert len(rows) == 2  # 3 docs, one source partition -> 2 neighbor pairs
    by_pair = {(r["doc_a"], r["doc_b"]): r for r in rows}
    r01 = by_pair[(0, 1)]
    assert r01["inter_size"] == 2 and r01["union_size"] == 4


# -- plan-shape guard (the measured 20x regression) ------------------------------


def test_lsh_plan_does_not_inline_minhash_into_scan(spark):
    """InferFiltersFromGenerate/-Constraints must not push the inlined
    minhash tree into the parquet/scan filters (was a 20x slowdown)."""
    df = _docs(spark, ["a b c d e f g"] * 20)
    plan = dedup.lsh_near_dup_pairs(df)._jdf.queryExecution().executedPlan().toString()
    # the tokenizer appears once per materialized projection branch; the
    # pathological plans had 1200-2600 copies
    assert plan.count("7919") < 60, f"tokenizer inlined {plan.count('7919')} times"


# -- similarity -----------------------------------------------------------------


@pytest.fixture()
def emb(spark):
    import math

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),          # identical to query
        (2, [0.9, 0.1, 0.0, 0.0]),          # close
        (3, [0.0, 1.0, 0.0, 0.0]),          # orthogonal
        (4, [-1.0, 0.0, 0.0, 0.0]),         # opposite
    ]
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in rows],
        "vec_id bigint, embedding array<float>, label int",
    )


def test_cosine_topk_ordering(emb):
    rows = similarity.cosine_topk(emb, query_id=0, k=3).collect()
    assert [r["vec_id"] for r in rows] == [1, 2, 3]
    assert rows[0]["cosine"] == pytest.approx(1.0)
    assert rows[2]["cosine"] == pytest.approx(0.0)


def test_lsh_ann_same_bucket_for_identical(emb):
    rows = similarity.lsh_ann_topk(emb, query_id=0, k=5).collect()
    ids = [r["vec_id"] for r in rows]
    assert 1 in ids  # identical vector shares every band key
    cosines = [r["cosine"] for r in rows]
    assert cosines == sorted(cosines, reverse=True)


def test_lsh_buckets_partition_space(emb):
    b = similarity.with_lsh_bucket(emb)
    vals = [r["bucket"] for r in b.collect()]
    assert all(0 <= v < 256 for v in vals)
    # opposite vectors flip every projection sign -> different bucket
    by_id = dict(zip([r["vec_id"] for r in b.collect()], vals))
    assert by_id[0] != by_id[4]
    assert by_id[0] == by_id[1]


# -- text analysis ----------------------------------------------------------------


def test_lang_id_stopword_votes(spark):
    df = _docs(spark, ["der hund und die katze ist nicht hier",
                       "the cat and the dog is a pet"])
    rows = {r["doc_id"]: r for r in textstats.lang_id(df).collect()}
    assert rows[0]["predicted_lang"] == "de"
    assert rows[1]["predicted_lang"] == "en"
    assert rows[0]["hits_de"] >= 4


def test_text_quality_values(spark):
    df = _docs(spark, ["aa bb aa cc!"])
    r = textstats.text_quality(df).collect()[0]
    assert r["n_words"] == 4
    assert r["n_distinct_words"] == 3
    assert r["n_chars"] == 12
    assert r["n_punct"] == 1
    assert r["max_word_len"] == 3  # "cc!"
    assert r["distinct_ratio"] == pytest.approx(0.75)


def test_token_counts(spark):
    df = _docs(spark, ["ab 12, cd!"])
    r = textstats.token_counts(df).collect()[0]
    assert r["ws_tokens"] == 3
    # [ab][1][2][,][cd][!]
    assert r["bpe_tokens"] == 6


def test_fingerprint_order_sensitive(spark):
    df = _docs(spark, ["a b c", "c b a", "a b c"])
    fp = [r["fingerprint"] for r in textstats.doc_fingerprint(df).collect()]
    assert fp[0] == fp[2]
    assert fp[0] != fp[1]  # same token SET, different order


# -- multimodal -------------------------------------------------------------------


def test_multimodal_plumbing_roundtrip(spark):
    df = multimodal.attach_binary_payload(_docs(spark, ["hello world", "abc"]))
    meta = {r["doc_id"]: r["n_bytes"] for r in multimodal.media_metadata(df).collect()}
    assert meta == {0: 11, 1: 3}
    feats = multimodal.extract_features(df, decoder=multimodal.fake_decoder).collect()
    by_id = {r["doc_id"]: r for r in feats}
    assert by_id[0]["n_bytes"] == 11
    assert by_id[0]["byte_sum"] == sum(b"hello world")
    for j in range(multimodal.N_FEATURES):
        assert by_id[0][f"feature_{j}"] is not None
    # deterministic across runs
    feats2 = multimodal.extract_features(df, decoder=multimodal.fake_decoder).collect()
    assert sorted(map(str, feats)) == sorted(map(str, feats2))


def test_multimodal_decode_stubbed(spark):
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"xx", "image/png")
    df = multimodal.attach_binary_payload(_docs(spark, ["x y"]))
    with pytest.raises(Exception):  # stub propagates through the UDF
        multimodal.extract_features(df, decoder=None).collect()


# -- driver contract consistency ---------------------------------------------------


def test_entry_contract_oracle_coverage():
    import __spark_entry__ as e

    qs = set(e.queries())
    oracles = set(e.oracle_sql())
    assert oracles <= qs
    # round 2: every driver query is oracle-gated, zero rows-only
    assert qs - oracles == set()


# -- composed corpus-prep pipeline -------------------------------------------------


def test_corpus_prep_composition(spark):
    from xml2arrow_spark.pipeline.prep import surviving_documents

    base = "the quick brown fox jumps over the lazy dog sits by the door and waits all day " * 2
    rows = [
        (0, base + "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi", "s0"),
        (1, base + "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu xi", "s0"),  # exact dup of 0
        (2, base + "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu XX", "s0"),  # near dup of 0
        (3, "short text", "s1"),  # fails quality (too few words)
        (4, base + "totally different ending with many unusual distinct closing words here now", "s1"),
    ]
    docs = spark.createDataFrame(
        [(i, t, s, len(t)) for i, t, s in rows],
        "doc_id bigint, text string, source string, n_chars int",
    )
    out = surviving_documents(docs)
    ids = sorted(r["doc_id"] for r in out.collect())
    # 1 dropped as exact dup, 2 dropped as near dup (canonical 0), 3 fails quality
    assert ids == [0, 4]
    if getattr(out, "_sig_cache", None) is not None:
        out._sig_cache.unpersist()
