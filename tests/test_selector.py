"""Codec auto-selection picks the expected winner per FIXTURES.md F1 variant."""

import numpy as np
import pytest

from xml2arrow_spark.codecs import StrData
from xml2arrow_spark.plans.selector import (
    choose_int_codec,
    choose_str_codec,
    estimate_int_sizes,
    int_stats,
)

RNG = np.random.default_rng(42)


@pytest.mark.parametrize(
    "variant,allowed",
    [
        ("uniform_vocab", {"bitpack", "for"}),  # 16-17 bits, per FIXTURES
        ("low_card", {"dict", "bitpack", "for", "pdict"}),  # 6 bits
        ("runny", {"rle"}),
        ("narrow_range", {"for", "pdict"}),
        ("skewed_zipf", {"pdict"}),  # patched dict is the zipf winner
        ("constant", {"rle", "for", "dict", "pdict"}),  # degenerate: ~0 bytes
        ("negative_sentinels", {"for", "dict", "pdict"}),  # signed range
    ],
)
def test_int_selection(variant, allowed):
    from tests.test_codecs import _variant

    values = _variant(variant, n=50000)
    assert choose_int_codec(values) in allowed


def test_estimates_track_reality():
    """Chosen codec's actual size is within 30% of its estimate."""
    from tests.test_codecs import _variant
    from xml2arrow_spark.codecs import encode_values

    for variant in ["uniform_vocab", "low_card", "runny", "narrow_range"]:
        values = _variant(variant, n=50000)
        est = estimate_int_sizes(int_stats(values), itemsize=4)
        codec = min(est, key=est.get)
        _, blob = encode_values(codec, values)
        assert len(blob) <= est[codec] * 1.3 + 64, (variant, codec)


def _strdata(strings):
    data = "".join(strings).encode()
    off = np.zeros(len(strings) + 1, dtype=np.int64)
    off[1:] = np.cumsum([len(s.encode()) for s in strings])
    return StrData(offsets=off, data=data)


def test_str_selection_prefers_dict_for_low_card():
    # FIXTURES.md: low-card sources must pick dict, NOT fsst. Suffix a
    # non-digit so the (even cheaper) seq_str path doesn't apply.
    sd = _strdata([f"src{i % 8}x" for i in range(20000)])
    assert choose_str_codec(sd) == "dict_str"


def test_str_selection_prefers_seq_for_sequential_ids():
    # fixed-template ids are an integer in disguise; seq_str beats fsst 3x+
    sd = _strdata([f"doc-{i:08d}" for i in range(20000)])
    assert choose_str_codec(sd) == "seq_str"


def test_str_selection_prefers_fsst_for_common_prefix():
    # common prefix + non-numeric variable tail -> symbol-table compression
    sd = _strdata([f"doc-{i:08d}x" for i in range(20000)])
    assert choose_str_codec(sd) == "fsst"


def test_str_selection_plain_for_random():
    rng = np.random.default_rng(7)
    sd = _strdata(
        ["".join(chr(rng.integers(33, 600)) for _ in range(20)) for _ in range(500)]
    )
    assert choose_str_codec(sd) in {"plain_str", "fsst"}


def test_resolve_manifest_spark(spark):
    from xml2arrow_spark.manifest import CodecManifest
    from xml2arrow_spark.plans import resolve_manifest
    from xml2arrow_spark.sources import tokens_dataframe

    df = tokens_dataframe(spark, 4000, variant="low_card", n_partitions=2)
    resolved = resolve_manifest(df, CodecManifest.auto_for(df.schema))
    assert resolved.columns["tokens"].codec in {"dict", "bitpack", "for", "pdict"}
    # src0..src7 and doc-%08d are both '<prefix><digits>' -> seq_str wins
    assert resolved.columns["source"].codec in {"dict_str", "seq_str"}
    assert resolved.columns["doc_id"].codec == "seq_str"
    # resolved manifest validates and yaml-round-trips
    resolved.validate(df.schema)
    assert CodecManifest.from_yaml(resolved.to_yaml()).columns["tokens"].codec == \
        resolved.columns["tokens"].codec
