"""Context-length chunking with overlapping strides — round-5 coverage
widening over pipeline/textstats.py::chunk_sequences."""

from __future__ import annotations

import pytest

from xml2arrow_spark.pipeline.textstats import chunk_sequences

FP_MOD = 2147483647


def _twin(corpus: dict[str, list[int]], L: int, st: int):
    out = {}
    for d, toks in corpus.items():
        n = len(toks)
        n_chunks = 0 if n <= 0 else 1 + max(0, n - L + st - 1) // st
        for c in range(n_chunks):
            chunk = toks[c * st : c * st + L]
            fp = 0
            for t in chunk:
                fp = (fp * 31 + t) % FP_MOD
            out[(d, c)] = (c * st, len(chunk), fp)
    return out


def _run(spark, corpus, L, st):
    df = spark.createDataFrame(
        sorted(corpus.items()), "doc_id string, tokens array<int>"
    )
    got = chunk_sequences(df, max_len=L, stride=st).collect()
    return {
        (r["doc_id"], r["chunk_id"]): (r["chunk_start"], r["chunk_len"], r["chunk_fp"])
        for r in got
    }


def test_overlap_coverage_and_fingerprints_exact(spark):
    corpus = {
        "a": list(range(20)),  # 4 chunks at L=8, st=4: starts 0,4,8,12
        "b": list(range(8)),  # exactly one chunk
        "c": list(range(9)),  # 2 chunks, last is short [4:9]
        "d": [5, 6, 7],  # shorter than L: one whole chunk
        "e": [],  # no chunks
    }
    got = _run(spark, corpus, 8, 4)
    want = _twin(corpus, 8, 4)
    assert got == want
    assert ("e", 0) not in got
    # the last chunk always reaches the final token
    assert got[("a", 3)] == (12, 8, want[("a", 3)][2])
    assert got[("c", 1)] == (4, 5, want[("c", 1)][2])
    # every doc's chunks jointly cover 0..n-1
    assert got[("b", 0)][1] == 8 and ("b", 1) not in got


def test_non_overlapping_default_stride(spark):
    corpus = {"a": list(range(17))}
    got = _run(spark, corpus, 8, 8)  # stride == max_len
    assert got == _twin(corpus, 8, 8)
    assert sorted(k[1] for k in got) == [0, 1, 2]  # 8 + 8 + 1
    assert got[("a", 2)] == (16, 1, 16 % FP_MOD)


def test_rejects_bad_geometry(spark):
    df = spark.createDataFrame([("a", [1, 2])], "doc_id string, tokens array<int>")
    for L, st in ((0, 1), (8, 0), (8, 9)):
        with pytest.raises(ValueError):
            chunk_sequences(df, max_len=L, stride=st)
