"""Seeded randomized stress for the dataset-mutation surface: a random
sequence of delete / upsert / lookup steps against one encoded dataset,
checked after EVERY step against a pure-python dict model — the
property-test value without a per-example Spark job (the repo's
randomized-pin convention, see test_curation_randomized.py)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from xml2arrow_spark.manifest import CodecManifest
from xml2arrow_spark.operators.checkpoint import (
    audit_dataset,
    delete_rows,
    encode_dataset,
    lookup_rows,
    read_encoded_dataset,
    upsert_rows,
)


def _tok_rows(model: dict) -> list:
    return [
        (d, toks, len(toks), src) for d, (toks, src) in sorted(model.items())
    ]


DDL = "doc_id string, tokens array<int>, n_tok int, source string"


def _df(spark, model):
    return spark.createDataFrame(_tok_rows(model), DDL)


def test_random_mutation_sequence_tracks_model(spark, tmp_path):
    rng = random.Random(20260817)
    model = {
        f"d{i:03d}": (
            [rng.randrange(50) for _ in range(rng.randrange(0, 30))],
            f"s{rng.randrange(3)}",
        )
        for i in range(220)
    }
    path = str(tmp_path / "ds")
    base = _df(spark, model)
    encode_dataset(
        base, path, CodecManifest.auto_for(base.schema, block_rows=64),
        n_units=4, presort=["doc_id"],
    )
    next_id = [220]

    def check():
        got = read_encoded_dataset(spark, path)
        rows = {
            r["doc_id"]: (list(r["tokens"]), r["source"])
            for r in got.collect()
        }
        assert rows == model

    for step in range(8):
        op = rng.choice(["delete", "upsert", "lookup"])
        if op == "delete" and model:
            doomed = rng.sample(sorted(model), k=min(len(model), rng.randrange(1, 25)))
            m = delete_rows(
                spark.createDataFrame([(d,) for d in doomed], "doc_id string"),
                path,
            )
            assert m["rows_deleted"] == len(doomed)
            for d in doomed:
                del model[d]
        elif op == "upsert":
            batch = {}
            for _ in range(rng.randrange(1, 20)):
                if model and rng.random() < 0.6:  # replace an existing doc
                    d = rng.choice(sorted(model))
                else:  # insert a new one
                    d = f"d{next_id[0]:03d}"
                    next_id[0] += 1
                batch[d] = (
                    [rng.randrange(50) for _ in range(rng.randrange(0, 30))],
                    f"s{rng.randrange(3)}",
                )
            m = upsert_rows(_df(spark, batch), path)
            assert m["rows_in_batch"] == len(batch)
            model.update(batch)
        else:  # lookup: mix of present and absent ids
            present = rng.sample(sorted(model), k=min(len(model), 5))
            probe = present + ["nope1", "nope2"]
            got = lookup_rows(
                spark.createDataFrame([(d,) for d in probe], "doc_id string"),
                path,
            )
            rows = {
                r["doc_id"]: (list(r["tokens"]), r["source"])
                for r in got.collect()
            }
            assert rows == {d: model[d] for d in present}
        check()

    rep = audit_dataset(spark, path, deep=True)
    assert rep["base"]["ok"] and rep["base"]["deep_rows"] == len(model)


def test_random_mutations_with_tombstones_track_visible_set(spark, tmp_path):
    """Same harness with the merge-on-read tier interleaved: tombstone /
    delete / upsert / apply / lookup in random order. The model tracks the
    VISIBLE set (physical rows minus pending tombstones) — fold timing
    (which mutation happened to rewrite a pending id's unit) must be
    unobservable to every read, which is exactly the tombstone contract."""
    from xml2arrow_spark.operators.tombstones import (
        apply_tombstones,
        has_pending,
        tombstone_rows,
    )

    rng = random.Random(20260819)
    data = {
        f"t{i:03d}": (
            [rng.randrange(50) for _ in range(rng.randrange(0, 30))],
            f"s{rng.randrange(3)}",
        )
        for i in range(180)
    }
    pending: set[str] = set()
    path = str(tmp_path / "ds")
    base = _df(spark, data)
    encode_dataset(
        base, path, CodecManifest.auto_for(base.schema, block_rows=64),
        n_units=4,
    )
    next_id = [180]

    def visible():
        return {d: v for d, v in data.items() if d not in pending}

    def check():
        got = read_encoded_dataset(spark, path)
        rows = {
            r["doc_id"]: (list(r["tokens"]), r["source"])
            for r in got.collect()
        }
        assert rows == visible()

    for step in range(10):
        op = rng.choice(["tombstone", "delete", "upsert", "apply", "lookup"])
        if op == "tombstone" and data:
            batch = rng.sample(sorted(data), k=min(len(data), rng.randrange(1, 15)))
            m = tombstone_rows(
                spark.createDataFrame([(d,) for d in batch], "doc_id string"),
                path,
            )
            assert m["ids_tombstoned"] == len(batch)
            pending.update(batch)
        elif op == "delete" and visible():
            doomed = rng.sample(
                sorted(visible()), k=min(len(visible()), rng.randrange(1, 15))
            )
            delete_rows(
                spark.createDataFrame([(d,) for d in doomed], "doc_id string"),
                path,
            )
            for d in doomed:
                data.pop(d, None)
            # pending ids in the rewritten units were FOLDED (left data and
            # the pending set together) — invisible to the visible set, so
            # the model needs no unit knowledge
        elif op == "upsert":
            batch = {}
            for _ in range(rng.randrange(1, 12)):
                r = rng.random()
                if pending and r < 0.4:  # re-insert a tombstoned id
                    d = rng.choice(sorted(pending))
                elif data and r < 0.7:  # replace a live doc
                    d = rng.choice(sorted(data))
                else:
                    d = f"t{next_id[0]:03d}"
                    next_id[0] += 1
                batch[d] = (
                    [rng.randrange(50) for _ in range(rng.randrange(0, 30))],
                    f"s{rng.randrange(3)}",
                )
            upsert_rows(_df(spark, batch), path)
            data.update(batch)
            pending.difference_update(batch)  # new versions are visible
        elif op == "apply":
            apply_tombstones(spark, path)
            assert not has_pending(path)
            for d in list(pending):
                data.pop(d, None)
            pending.clear()
        else:  # lookup: live + tombstoned + absent ids in one batch
            live = rng.sample(sorted(visible()), k=min(len(visible()), 4))
            hid = rng.sample(sorted(pending), k=min(len(pending), 3))
            got = lookup_rows(
                spark.createDataFrame(
                    [(d,) for d in live + hid + ["nope"]], "doc_id string"
                ),
                path,
            )
            rows = {
                r["doc_id"]: (list(r["tokens"]), r["source"])
                for r in got.collect()
            }
            assert rows == {d: data[d] for d in live}
        check()

    # settle and fsck: after the fold the physical rows ARE the visible set
    apply_tombstones(spark, path)
    for d in list(pending):
        data.pop(d, None)
    pending.clear()
    rep = audit_dataset(spark, path, deep=True)
    assert rep["base"]["ok"] and rep["base"]["deep_rows"] == len(data)
