"""Error taxonomy — one asserted sample per variant, mirroring the
reference's per-variant discipline (/root/reference/src/errors.rs:430-491:
each error constructed, displayed, and type-checked)."""

import json

import numpy as np
import pyarrow as pa
import pytest

from xml2arrow_spark.codecs import encode_values
from xml2arrow_spark.errors import (
    BlockCorruptionError,
    EncodeTypeError,
    EncodeValueError,
    ManifestError,
    UnknownCodecError,
    X2AError,
)
from xml2arrow_spark.manifest import CodecManifest, ColumnPolicy
from xml2arrow_spark.operators.blocks import (
    BLOCK_FORMAT_VERSION,
    decode_column,
    encode_column,
)


def test_hierarchy_preserves_builtin_contracts():
    # every variant is an X2AError AND its historical builtin, so existing
    # `except ValueError` call sites keep working
    assert issubclass(ManifestError, (X2AError, ValueError))
    assert issubclass(EncodeTypeError, (X2AError, TypeError))
    assert issubclass(EncodeValueError, (X2AError, ValueError))
    assert issubclass(BlockCorruptionError, (X2AError, ValueError))
    assert issubclass(UnknownCodecError, (X2AError, KeyError))


def test_manifest_error_unknown_column():
    m = CodecManifest(columns={"nope": ColumnPolicy()})
    with pytest.raises(ManifestError, match="unknown column"):
        m.validate([("real_col", "int")])


def test_manifest_error_codec_type_mismatch():
    m = CodecManifest(columns={"s": ColumnPolicy(codec="bitpack")})
    with pytest.raises(ManifestError, match="not valid for"):
        m.validate([("s", "string")])


def test_encode_type_error_unsupported_dtype():
    with pytest.raises(EncodeTypeError, match="unsupported integer dtype"):
        encode_values("plain", np.array([1.5, 2.5]))


def test_encode_type_error_float16_column():
    arr = pa.array(np.array([1.0, 2.0], dtype=np.float16), type=pa.float16())
    with pytest.raises(EncodeTypeError, match="float16"):
        encode_column(arr, "auto")


def test_encode_value_error_negative_bitpack():
    with pytest.raises(EncodeValueError, match="non-negative"):
        encode_values("bitpack", np.array([-1, 2], dtype=np.int32))


def test_encode_value_error_width_overflow():
    from xml2arrow_spark.codecs.bitpack import pack_uint

    with pytest.raises(EncodeValueError, match="does not fit"):
        pack_uint(np.array([9], dtype=np.uint64), 3)


def test_block_corruption_rle_length_mismatch():
    meta, blob = encode_values("rle", np.array([1, 1, 2, 2, 2], dtype=np.int32))
    meta = dict(meta, n=99)  # header lies about the row count
    from xml2arrow_spark.codecs import decode_values

    with pytest.raises(BlockCorruptionError, match="expected 99"):
        decode_values(meta, blob)


def test_block_corruption_old_format_rejected():
    arr = pa.array([[1, 2], [3]], type=pa.list_(pa.int32()))
    _, meta_json, blob = encode_column(arr, "auto")
    meta = json.loads(meta_json)
    assert meta["fmt"] == BLOCK_FORMAT_VERSION
    meta.pop("fmt")  # a v1 block (pre-format-tag) must be rejected, never misread
    with pytest.raises(BlockCorruptionError, match="block format 1"):
        decode_column(json.dumps(meta), blob)


def test_unknown_codec_error():
    with pytest.raises(UnknownCodecError, match="unknown codec"):
        encode_values("snappy", np.array([1], dtype=np.int32))


def test_block_crc_detects_bit_rot():
    """Every stored block header carries a CRC-32 of the exact stored bytes
    (r05): a single flipped bit anywhere in the payload must raise
    BlockCorruptionError instead of decoding silently wrong values — for
    BOTH the raw and the cascade-compressed layouts (the cascade crc covers
    the compressed bytes, so corruption is caught before decompression)."""
    arr = pa.array([[i, i + 1, i + 2] for i in range(2000)], type=pa.list_(pa.int32()))
    for codec in ("auto", "auto+zstd"):
        _, meta_json, blob = encode_column(arr, codec)
        assert '"crc"' in meta_json
        # pristine bytes decode fine
        assert decode_column(meta_json, blob).equals(arr)
        flipped = bytearray(blob)
        flipped[len(flipped) // 2] ^= 0x01
        with pytest.raises(BlockCorruptionError, match="CRC mismatch"):
            decode_column(meta_json, bytes(flipped))


def test_block_without_crc_stays_readable():
    """Blocks written before the crc field existed (same format version)
    must keep decoding — the integrity gate is binding only when the header
    carries a crc."""
    arr = pa.array([1, 2, 3, None, 5], type=pa.int64())
    _, meta_json, blob = encode_column(arr, "auto")
    meta = json.loads(meta_json)
    meta.pop("crc")
    assert decode_column(json.dumps(meta), blob).equals(arr)
