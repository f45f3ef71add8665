"""Seeded randomized stress pins for the round-5 curation operators:
one Spark job per configuration over a diverse generated corpus, exact
dict-equality against the pure-python twins (the property-test value
without a per-example Spark job)."""

from __future__ import annotations

import random

from tests.test_chunk_sequences import _twin as chunk_twin
from tests.test_token_span_dedup import _twin as span_twin
from xml2arrow_spark.pipeline.dedup import token_span_dedup
from xml2arrow_spark.pipeline.textstats import chunk_sequences


def _random_corpus(seed: int, n_docs: int = 160, alphabet: int = 6):
    # tiny alphabet + planted repeats force genuine frequent windows;
    # lengths sweep 0..40 so every short-doc edge is exercised
    rng = random.Random(seed)
    shared = [rng.randrange(alphabet) for _ in range(12)]
    corpus = {}
    for i in range(n_docs):
        n = rng.randrange(0, 41)
        toks = [rng.randrange(alphabet) for _ in range(n)]
        if n >= 12 and rng.random() < 0.3:  # plant a cross-doc repeat
            at = rng.randrange(0, n - 11)
            toks[at : at + 12] = shared
        corpus[f"d{i:03d}"] = toks
    return corpus


def _df(spark, corpus):
    return spark.createDataFrame(
        sorted(corpus.items()), "doc_id string, tokens array<int>"
    )


def test_span_dedup_matches_twin_across_geometries(spark):
    corpus = _random_corpus(seed=7)
    for span, max_df in ((4, 1), (8, 2), (8, 0)):
        got = {
            r["doc_id"]: (
                r["n_tok"],
                r["n_frequent_spans"],
                r["n_kept"],
                r["kept_fp"],
            )
            for r in token_span_dedup(
                _df(spark, corpus), span=span, max_df=max_df
            ).collect()
        }
        assert got == span_twin(corpus, span, max_df), (span, max_df)


def test_chunking_matches_twin_across_geometries(spark):
    corpus = _random_corpus(seed=11)
    for L, st in ((8, 4), (16, 16), (5, 1), (40, 13)):
        got = {
            (r["doc_id"], r["chunk_id"]): (
                r["chunk_start"],
                r["chunk_len"],
                r["chunk_fp"],
            )
            for r in chunk_sequences(
                _df(spark, corpus), max_len=L, stride=st
            ).collect()
        }
        assert got == chunk_twin(corpus, L, st), (L, st)
