"""Control/whitespace text normalization — round-5 coverage widening
over pipeline/textstats.py::normalize_text."""

from __future__ import annotations

import re

from xml2arrow_spark.pipeline.textstats import CONTROL_CLASS, WS_RUN, normalize_text


def _twin(text: str) -> tuple[str, int, int]:
    stripped = re.sub(CONTROL_CLASS, "", text)
    clean = re.sub(WS_RUN, " ", stripped).strip(" ")
    return clean, len(text) - len(stripped), len(clean)


def _run(spark, texts: dict[str, str]):
    df = spark.createDataFrame(sorted(texts.items()), "doc_id string, text string")
    return {
        r["doc_id"]: (r["clean"], r["n_control"], r["clean_len"])
        for r in normalize_text(df).collect()
    }


def test_controls_stripped_whitespace_collapsed(spark):
    texts = {
        "a": "\x01\x02hi\x07 there\x7f",
        "b": "a\t\tb \r\n c\x0c\x0cd",
        "c": "  already clean  ",
        "d": "\x0b\x0e\x1f",  # controls only -> empty
        "e": "",
        "f": "no-ws-or-controls",
    }
    got = _run(spark, texts)
    assert got == {d: _twin(t) for d, t in texts.items()}
    assert got["a"] == ("hi there", 4, 8)
    assert got["b"] == ("a b c d", 0, 7)
    assert got["c"][0] == "already clean"
    assert got["d"] == ("", 3, 0)


def test_interior_runs_mixing_controls_and_ws(spark):
    # a control char INSIDE a whitespace run: strip first, then the
    # remaining run still collapses to one space
    texts = {"a": "x \x01\t y", "b": "\t\x05\t"}
    got = _run(spark, texts)
    assert got == {d: _twin(t) for d, t in texts.items()}
    assert got["a"][0] == "x y"
    assert got["b"][0] == ""
