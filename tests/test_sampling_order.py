"""Target-mixture resampling (data mixing) and deterministic corpus
shuffle order — round-5 coverage widening over pipeline/sampling.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xml2arrow_spark.pipeline.sampling import mixture_sample, shuffle_order

SAMPLE_MOD = 1000


def _bucket(doc_id: int) -> int:
    # python twin of sqlgen.sample_hash_expr
    return ((doc_id % 1000003) * 8191 + 12345) % SAMPLE_MOD


def _rh(doc_id: int) -> int:
    # python twin of sqlgen.shuffle_hash_expr
    return ((doc_id % 1000003) * 2654435761 + 97) % 1000003


def _corpus(spark, per_source: dict[str, int]):
    rows, next_id = [], 0
    for src, n in sorted(per_source.items()):
        for _ in range(n):
            rows.append((next_id, src))
            next_id += 1
    return spark.createDataFrame(rows, "doc_id bigint, source string")


def _expected_mixture(per_source: dict[str, int], weights: dict[str, int]):
    live = {s: w for s, w in weights.items() if w > 0}
    total = min((per_source[s] * SAMPLE_MOD) // w for s, w in live.items())
    return {s: (total * w) // per_source[s] for s, w in live.items()}


def test_mixture_fractions_and_rows_exact(spark):
    per_source = {"a": 200, "b": 50, "c": 100}
    weights = {"a": 500, "b": 400, "c": 100}
    docs = _corpus(spark, per_source)
    got = mixture_sample(docs, weights).collect()

    fracs = _expected_mixture(per_source, weights)
    # binding source is b: T = min(400, 125, 1000) = 125
    assert fracs == {"a": (125 * 500) // 200, "b": 1000, "c": (125 * 100) // 100}
    assert all(f <= 1000 for f in fracs.values())

    ids = {s: set() for s in per_source}
    next_id = 0
    for src, n in sorted(per_source.items()):
        for _ in range(n):
            ids[src].add(next_id)
            next_id += 1
    want = {
        (i, s)
        for s, f in fracs.items()
        for i in ids[s]
        if _bucket(i) < f
    }
    assert {(r["doc_id"], r["source"]) for r in got} == want
    assert all(r["f_milli"] == fracs[r["source"]] for r in got)


def test_mixture_binding_source_keeps_everything_it_can(spark):
    # equal counts, skewed weights: the heaviest-weighted source binds
    per_source = {"a": 40, "b": 40}
    docs = _corpus(spark, per_source)
    out = mixture_sample(docs, {"a": 900, "b": 100})
    fracs = {r["source"]: r["f_milli"] for r in out.select("source", "f_milli").distinct().collect()}
    assert fracs["a"] == 990  # T = 40000//900 = 44; (44*900)//40
    assert fracs["b"] == 110
    assert max(fracs.values()) <= 1000


def test_mixture_missing_source_raises(spark):
    docs = _corpus(spark, {"a": 10})
    with pytest.raises(ValueError, match="absent from the corpus"):
        mixture_sample(docs, {"a": 500, "ghost": 500})


def test_mixture_rejects_degenerate_weights(spark):
    docs = _corpus(spark, {"a": 10})
    with pytest.raises(ValueError):
        mixture_sample(docs, {})
    with pytest.raises(ValueError):
        mixture_sample(docs, {"a": 0})
    with pytest.raises(ValueError):
        mixture_sample(docs, {"a": -5})


def test_mixture_injected_counts_match_computed(spark):
    per_source = {"a": 60, "b": 30}
    docs = _corpus(spark, per_source)
    weights = {"a": 700, "b": 300}
    auto = {(r["doc_id"], r["f_milli"]) for r in mixture_sample(docs, weights).collect()}
    inj = {
        (r["doc_id"], r["f_milli"])
        for r in mixture_sample(docs, weights, counts=per_source).collect()
    }
    assert auto == inj


def test_mixture_zero_weight_drops_source(spark):
    docs = _corpus(spark, {"a": 30, "b": 30})
    out = mixture_sample(docs, {"a": 1000, "b": 0})
    assert {r["source"] for r in out.collect()} == {"a"}


def test_shuffle_order_dense_deterministic_and_partition_invariant(spark):
    docs = _corpus(spark, {"a": 120, "b": 80})
    n_shards = 7
    got = shuffle_order(docs, n_shards=n_shards).collect()
    assert len(got) == 200  # every row gets an order slot

    by_shard: dict[int, list] = {}
    for r in got:
        by_shard.setdefault(r["shard"], []).append(r)
    # dense 0..k-1 positions inside every shard
    for shard, rows in by_shard.items():
        assert 0 <= shard < n_shards
        assert sorted(r["pos"] for r in rows) == list(range(len(rows)))

    # exact python twin: shard = rh % n, pos = rank by (rh, id) in shard
    want: dict[int, tuple[int, int]] = {}
    per_shard: dict[int, list[tuple[int, int]]] = {}
    for r in got:
        per_shard.setdefault(_rh(r["doc_id"]) % n_shards, [])
    all_ids = [r["doc_id"] for r in got]
    for i in all_ids:
        per_shard[_rh(i) % n_shards].append((_rh(i), i))
    for shard, keyed in per_shard.items():
        for pos, (_, i) in enumerate(sorted(keyed)):
            want[i] = (shard, pos)
    assert {r["doc_id"]: (r["shard"], r["pos"]) for r in got} == want

    # stable under a different physical partitioning of the input
    again = shuffle_order(docs.repartition(13), n_shards=n_shards).collect()
    assert {r["doc_id"]: (r["shard"], r["pos"]) for r in again} == want


def test_shuffle_order_not_sample_bucket_sorted(spark):
    """The shuffle hash must be uncorrelated with the SAMPLE hash: a
    sampled-then-shuffled corpus must not come out bucket-sorted."""
    docs = _corpus(spark, {"a": 100})
    got = shuffle_order(docs, n_shards=1).collect()
    order = [r["doc_id"] for r in sorted(got, key=lambda r: r["pos"])]
    buckets = [_bucket(i) for i in order]
    assert buckets != sorted(buckets)


def test_shuffle_order_rejects_bad_shards(spark):
    docs = _corpus(spark, {"a": 3})
    with pytest.raises(ValueError):
        shuffle_order(docs, n_shards=0)
