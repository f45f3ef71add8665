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
