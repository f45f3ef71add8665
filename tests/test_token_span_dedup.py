"""Token-span (substring) exact dedup — round-5 coverage widening over
pipeline/dedup.py::token_span_dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from xml2arrow_spark.pipeline.dedup import token_span_dedup

M1, B1 = 2147483647, 31
M2, B2 = 2147483629, 131
FP_MOD = 2147483647


def _key(window: list[int]) -> int:
    h1 = window[0] % M1
    h2 = window[0] % M2
    for t in window[1:]:
        h1 = (h1 * B1 + t) % M1
        h2 = (h2 * B2 + t) % M2
    return h1 * M2 + h2


def _twin(corpus: dict[str, list[int]], k: int, max_df: int):
    from collections import defaultdict

    docs_of = defaultdict(set)
    for d, toks in corpus.items():
        for i in range(len(toks) - k + 1):
            docs_of[_key(toks[i : i + k])].add(d)
    frequent = {key for key, ds in docs_of.items() if len(ds) > max_df}
    out = {}
    for d, toks in corpus.items():
        starts = [
            i
            for i in range(len(toks) - k + 1)
            if _key(toks[i : i + k]) in frequent
        ]
        covered = set()
        for s in starts:
            covered.update(range(s, s + k))
        kept = [t for p, t in enumerate(toks) if p not in covered]
        fp = 0
        for t in kept:
            fp = (fp * 31 + t) % FP_MOD
        out[d] = (len(toks), len(starts), len(kept), fp)
    return out


def _df(spark, corpus: dict[str, list[int]]):
    rows = [(d, toks) for d, toks in sorted(corpus.items())]
    return spark.createDataFrame(rows, "doc_id string, tokens array<int>")


def _run(spark, corpus, span, max_df):
    got = token_span_dedup(_df(spark, corpus), span=span, max_df=max_df).collect()
    return {
        r["doc_id"]: (r["n_tok"], r["n_frequent_spans"], r["n_kept"], r["kept_fp"])
        for r in got
    }


def test_planted_boilerplate_span_dropped_everywhere(spark):
    boiler = [7, 7, 3, 9, 1, 4, 4, 2]  # appears in 4 docs > max_df=2
    rare = [5, 6, 5, 6, 5, 6, 5, 6]  # appears in 2 docs: survives
    corpus = {
        "a": [10, 11] + boiler + [12, 13],
        "b": boiler + [20] * 6,
        "c": [30] * 4 + boiler,
        "d": [40] + boiler + [41, 42, 43],
        "e": rare + [50] * 8,
        "f": [60] * 8 + rare,
    }
    got = _run(spark, corpus, span=8, max_df=2)
    assert got == _twin(corpus, 8, 2)
    # the planted span is gone from every carrier doc
    for d in "abcd":
        n_tok, n_freq, n_kept, _ = got[d]
        assert n_freq >= 1 and n_kept <= n_tok - 8
    # the 2-doc span survives whole
    for d in "ef":
        assert got[d][1] == 0 and got[d][2] == got[d][0]


def test_overlapping_frequent_windows_cover_union(spark):
    # a 10-token duplicated run: 3 overlapping 8-windows, coverage is the
    # union (all 10 positions), not 3*8
    run = list(range(100, 110))
    corpus = {
        "a": run + [1, 2, 3],
        "b": [4, 5] + run,
        "c": run + [6] * 5,
        "d": [7] * 13,
    }
    got = _run(spark, corpus, span=8, max_df=2)
    assert got == _twin(corpus, 8, 2)
    assert got["a"] == (13, 3, 3, _twin(corpus, 8, 2)["a"][3])


def test_short_and_empty_docs_untouched(spark):
    corpus = {"a": [1, 2, 3], "b": [], "c": [9] * 7}
    got = _run(spark, corpus, span=8, max_df=0)
    assert got == _twin(corpus, 8, 0)
    for d, toks in corpus.items():
        assert got[d][0] == len(toks)
        assert got[d][1] == 0
        assert got[d][2] == len(toks)


def test_all_boilerplate_doc_empties(spark):
    span = [1, 2, 3, 4, 5, 6, 7, 8]
    corpus = {"a": span, "b": span, "c": span, "d": span + [99] * 4}
    got = _run(spark, corpus, span=8, max_df=2)
    assert got == _twin(corpus, 8, 2)
    assert got["a"] == (8, 1, 0, 0)  # emptied: fold of [] is 0


def test_keys_path_two_phase_identical(spark, tmp_path):
    """The materialized-window shape (keys_path=) must be invisible to
    results — same contract as the sig_path pair generators."""
    boiler = [7, 7, 3, 9, 1, 4, 4, 2]
    corpus = {
        "a": [10, 11] + boiler,
        "b": boiler + [20] * 3,
        "c": boiler,
        "d": [40] * 9,
    }
    direct = _run(spark, corpus, span=8, max_df=2)
    two_phase = {
        r["doc_id"]: (r["n_tok"], r["n_frequent_spans"], r["n_kept"], r["kept_fp"])
        for r in token_span_dedup(
            _df(spark, corpus), span=8, max_df=2,
            keys_path=str(tmp_path / "win"),
        ).collect()
    }
    assert two_phase == direct == _twin(corpus, 8, 2)


def test_negative_tokens_round_trip(spark):
    # int32 tokens may be negative; both engines' % truncates toward zero
    # identically, so keys and folds stay deterministic
    neg = [-5, -4, -3, -2, -1, 0, 1, 2]
    corpus = {"a": neg + [3], "b": neg, "c": [9] + neg, "d": [8] * 9}
    got = _run(spark, corpus, span=8, max_df=2)
    assert got == _twin(corpus, 8, 2)
    assert got["a"][2] == 1  # only the trailing token survives
