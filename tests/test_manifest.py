"""Manifest model + validation — mirrors the reference's config test layer
(/root/reference/src/config.rs:589-1212): YAML round-trip preserves values,
unknown-key tolerance, structural validation errors."""

import pytest

from xml2arrow_spark.manifest import CodecManifest, ColumnPolicy, ManifestError

SCHEMA = [
    ("doc_id", "string"),
    ("tokens", "array<int>"),
    ("n_tok", "int"),
    ("source", "string"),
]


def test_yaml_roundtrip_preserves_values():
    m = CodecManifest(
        columns={
            "tokens": ColumnPolicy(codec="for", dict_max_card_ratio=0.25),
            "doc_id": ColumnPolicy(codec="fsst", nullable=False),
        },
        block_rows=1234,
    )
    m2 = CodecManifest.from_yaml(m.to_yaml())
    assert m2.block_rows == 1234
    assert m2.columns["tokens"].codec == "for"
    assert m2.columns["tokens"].dict_max_card_ratio == 0.25
    assert m2.columns["doc_id"].nullable is False
    assert m2.to_yaml() == m.to_yaml()


def test_unknown_policy_keys_tolerated():
    # serde-style tolerance: /root/reference/src/config.rs:766-802
    m = CodecManifest.from_yaml(
        "columns:\n  tokens:\n    codec: rle\n    future_knob: 7\nblock_rows: 10\n"
    )
    assert m.columns["tokens"].codec == "rle"


def test_unknown_column_rejected():
    m = CodecManifest(columns={"ghost": ColumnPolicy()})
    with pytest.raises(ManifestError, match="ghost"):
        m.validate(SCHEMA)


def test_codec_type_compatibility():
    with pytest.raises(ManifestError, match="fsst"):
        CodecManifest(columns={"n_tok": ColumnPolicy(codec="fsst")}).validate(SCHEMA)
    with pytest.raises(ManifestError, match="rle"):
        CodecManifest(columns={"doc_id": ColumnPolicy(codec="rle")}).validate(SCHEMA)
    # list columns take integer codecs
    CodecManifest(columns={"tokens": ColumnPolicy(codec="rle")}).validate(SCHEMA)


def test_unsupported_type_rejected():
    # doubles are supported since plain_float; maps/structs are not
    with pytest.raises(ManifestError, match="unsupported type"):
        CodecManifest(columns={"m": ColumnPolicy()}).validate(
            [("m", "map<string,int>")]
        )


def test_float_and_bool_codec_compat():
    CodecManifest(columns={"f": ColumnPolicy(codec="plain_float")}).validate(
        [("f", "double")]
    )
    CodecManifest(columns={"b": ColumnPolicy(codec="bool_pack")}).validate(
        [("b", "boolean")]
    )
    with pytest.raises(ManifestError):  # type/codec mismatch
        CodecManifest(columns={"f": ColumnPolicy(codec="for")}).validate(
            [("f", "double")]
        )


def test_bad_block_rows():
    with pytest.raises(ManifestError, match="block_rows"):
        CodecManifest(columns={}, block_rows=0).validate(SCHEMA)


def test_invalid_codec_name():
    with pytest.raises(ManifestError):
        CodecManifest(columns={"n_tok": ColumnPolicy(codec="zstd")}).validate(SCHEMA)


def test_file_roundtrip(tmp_path):
    m = CodecManifest(columns={"tokens": ColumnPolicy(codec="dict")})
    p = str(tmp_path / "m.yaml")
    m.to_yaml_file(p)
    assert CodecManifest.from_yaml_file(p).columns["tokens"].codec == "dict"
