"""Structured error taxonomy for the encode engine.

The reference ships a 621-LoC structured error model — one typed variant per
failure mode, each carrying enough context to act on, with tests asserting
one sample per variant (/root/reference/src/errors.rs:1-621, test discipline
at src/errors.rs:430-491). This module mirrors the variants that apply to a
columnar-encode engine:

=====================  =====================================================
reference variant      engine counterpart
=====================  =====================================================
``ConfigError``        :class:`ManifestError` (re-exported by
                       :mod:`xml2arrow_spark.manifest`)
``UnsupportedDataType``:class:`EncodeTypeError` — a codec asked to encode a
                       dtype it does not support
``ParseError`` /       :class:`EncodeValueError` — a value violates the
``Overflow``           codec's contract (negative into bitpack, value wider
                       than the declared width). Like the reference's
                       full-consumption parse (src/xml_parser.rs:209-215),
                       the engine errors rather than silently truncating.
``...`` (decode side)  :class:`BlockCorruptionError` — a persisted block is
                       internally inconsistent (length mismatch, unknown
                       section kind, format-version mismatch)
unknown config key     :class:`UnknownCodecError` — a codec name not in the
                       registry
=====================  =====================================================

Every class subclasses both the engine base and the builtin it historically
raised (TypeError/ValueError/KeyError), so existing ``except ValueError``
call sites keep working.
"""

from __future__ import annotations

__all__ = [
    "X2AError",
    "ManifestError",
    "EncodeTypeError",
    "EncodeValueError",
    "BlockCorruptionError",
    "UnknownCodecError",
]


class X2AError(Exception):
    """Base class for all engine errors."""


class ManifestError(X2AError, ValueError):
    """Manifest/config validation failure — the analog of the reference's
    structured config errors (/root/reference/src/errors.rs)."""


class EncodeTypeError(X2AError, TypeError):
    """A codec or the block encoder was handed a column type it does not
    support (the ``UnsupportedDataType`` analog)."""


class EncodeValueError(X2AError, ValueError):
    """A value violates the selected codec's contract — e.g. negative values
    into ``bitpack``, or a value wider than the declared bit width. The
    engine never silently truncates (reference: full-consumption parse with
    overflow errors, /root/reference/src/xml_parser.rs:200-240)."""


class BlockCorruptionError(X2AError, ValueError):
    """A persisted block failed a decode-side consistency check: decoded
    length != header length, unknown section kind, or a format-version
    mismatch. Old-format blocks are REJECTED, never silently misread."""


class UnknownCodecError(X2AError, KeyError):
    """Codec name not present in the registry."""
