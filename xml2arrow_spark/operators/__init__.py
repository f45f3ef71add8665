"""Spark operators: encode/decode, partitioning, checkpoint, verification."""

from xml2arrow_spark.operators.encode import (
    BLOCKS_SCHEMA_DDL,
    blocks_metadata,
    decode_table,
    encode_table,
)

__all__ = ["encode_table", "decode_table", "blocks_metadata", "BLOCKS_SCHEMA_DDL"]
