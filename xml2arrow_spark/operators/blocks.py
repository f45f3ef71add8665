"""Arrow-level block encode/decode for one column.

A *block* is a bounded run of rows (``manifest.block_rows``) from one input
partition, all columns encoded over the same row span — the per-table
RecordBatch finalize of the reference (``TableBuilder::finish``,
/root/reference/src/xml_parser.rs:491-511), except the payload is a
compressed byte stream per column instead of raw builders.

Null handling follows the reference's uniform contract
(/root/reference/src/xml_parser.rs:327-338, 2645-2838): validity is its own
bitpacked section; the value stream holds non-null values only; decode
re-expands exactly. Empty string != null round-trips (Utf8 asymmetry).
"""

from __future__ import annotations

import json
import zlib

import numpy as np
import pyarrow as pa

from xml2arrow_spark.codecs import decode_values, encode_values
from xml2arrow_spark.errors import (
    BlockCorruptionError,
    EncodeTypeError,
    EncodeValueError,
)
from xml2arrow_spark.codecs.base import (
    StrData,
    strdata_from_arrow,
    strdata_to_arrow,
)
from xml2arrow_spark.plans.selector import choose_int_codec, choose_str_codec

__all__ = ["encode_column", "decode_column", "ENCODED_COL_STRUCT", "BLOCK_FORMAT_VERSION"]

# On-disk block format version. v2: byte-aligned bitpack widths 16/32/64
# switched from MSB-first big-endian bit-streams to native little-endian
# narrow integers; v1 blocks (no tag) are REJECTED at decode rather than
# silently misread (ADVICE r01; the reference never silently misparses,
# /root/reference/src/xml_parser.rs:209-215).
BLOCK_FORMAT_VERSION = 2

ENCODED_COL_STRUCT = (
    "name: string, codec: string, meta: string, data: binary, "
    "in_bytes: long, out_bytes: long"
)


def _validity(arr: pa.Array) -> tuple[np.ndarray | None, bytes]:
    if arr.null_count == 0:
        return None, b""
    mask = np.asarray(arr.is_valid())
    return mask, np.packbits(mask).tobytes()


def _encode_float_values(codec: str, values: np.ndarray, cascade: str | None = None):
    """Shared float-value encode for the scalar and list paths: the
    ALP-style decimal probe with the bit-exact plain fallback (NaN / inf /
    -0.0 / true reals) — ONE copy so the two paths can never diverge.
    When ``cascade`` names the general coder that will wrap this payload
    (an ``auto+zstd`` policy), the non-decimal fallback is chosen between
    plain_float and bss_float by the bounded compression probe — byte-plane
    splitting is only worth anything under a cascade (see
    codecs/floats.py::encode_bss_float). Returns (resolved, values_meta,
    values_blob)."""
    if codec in ("auto", "dec_float", "alp_float"):
        if codec != "alp_float":
            try:
                vmeta, vblob = encode_values("dec_float", values)
                return "dec_float", vmeta, vblob
            except EncodeValueError:
                pass
        if codec in ("auto", "alp_float"):
            # almost-decimal: integer path + bounded exception patch list
            # (full ALP); rejects cheaply past the exception budget
            try:
                vmeta, vblob = encode_values("alp_float", values)
                return "alp_float", vmeta, vblob
            except EncodeValueError:
                pass
        fallback = "plain_float"
        if codec == "auto" and cascade:
            from xml2arrow_spark.codecs.floats import _bss_probe_wins

            if values.size and _bss_probe_wins(values, cascade):
                fallback = "bss_float"
        vmeta, vblob = encode_values(fallback, values)
        return fallback, vmeta, vblob
    vmeta, vblob = encode_values(codec, values)
    return codec, vmeta, vblob


def _resolve_int(codec: str, values: np.ndarray) -> str:
    if codec == "auto":
        return choose_int_codec(values)
    if codec == "bitpack" and values.size and int(values.min()) < 0:
        return "for"  # safety fallback; never silently corrupt
    if codec == "pdict" and values.size:
        from xml2arrow_spark.codecs.integers import PDICT_MAX_RANGE

        if int(values.max()) - int(values.min()) >= PDICT_MAX_RANGE:
            return "for"  # sample said pdict, this block's range says no
    return codec


# below this payload size the general coder's frame overhead dominates
GENERAL_MIN_BYTES = 64


def encode_column(arr: pa.Array, codec: str) -> tuple[str, str, bytes]:
    """Encode one Arrow column chunk -> (resolved_codec, meta_json, payload).

    Supports integer/float/boolean/decimal(p,0) scalars, strings, and
    list/large_list of integers or floats (embedding columns).
    ``codec='auto'`` resolves per block via the selector.

    A ``+zstd`` / ``+lz4`` suffix (e.g. ``"auto+zstd"``) cascades a
    general-purpose coder over the lightweight codec's payload —
    lightweight encodings expose structure, the general coder squeezes
    the residual entropy (the BtrBlocks/Parquet layering). Per block,
    applied only when it actually shrinks the payload (a block that
    doesn't benefit stores the raw stream; decode is branch-free either
    way), so the cascade can only help, never hurt size."""
    base, _, general = codec.partition("+")
    resolved, meta_json, payload = _encode_column_raw(arr, base, cascade=general or None)
    if general:
        from xml2arrow_spark.codecs import GENERAL_CODECS
        from xml2arrow_spark.errors import UnknownCodecError

        if general not in GENERAL_CODECS:
            raise UnknownCodecError(
                f"unknown general codec {general!r}; supported: {GENERAL_CODECS}"
            )
        if len(payload) >= GENERAL_MIN_BYTES:
            comp = pa.Codec(general).compress(payload, asbytes=True)
            # the wrapper meta costs ~80 bytes of JSON; require a real win
            if len(comp) + 80 < len(payload):
                meta = {
                    "kind": "general",
                    "fmt": BLOCK_FORMAT_VERSION,
                    "g": general,
                    "raw_len": len(payload),
                    "crc": zlib.crc32(comp),
                    "inner": meta_json,
                }
                return f"{resolved}+{general}", json.dumps(meta), comp
    return resolved, _stamp_crc(meta_json, payload), payload


def _stamp_crc(meta_json: str, payload: bytes) -> str:
    """Record the CRC-32 of the STORED payload in the outer block header —
    decode_column refuses to decode a flipped bit instead of returning
    silently wrong values (the reference's no-silent-corruption contract,
    /root/reference/src/xml_parser.rs:209-215, extended to the storage
    layer: at 10^12-sequence scale, undetected media bit-rot is a
    certainty, not a tail risk). Only the outermost header carries a crc:
    it covers the exact bytes read back from storage (compressed when a
    cascade applied), so one pass verifies everything beneath it."""
    m = json.loads(meta_json)
    m["crc"] = zlib.crc32(payload)
    return json.dumps(m)


def _encode_column_raw(
    arr: pa.Array, codec: str, cascade: str | None = None
) -> tuple[str, str, bytes]:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    mask, validity = _validity(arr)
    n = len(arr)

    if pa.types.is_list(t) or pa.types.is_large_list(t):
        if not (
            pa.types.is_integer(t.value_type) or pa.types.is_floating(t.value_type)
        ):
            raise EncodeTypeError(
                f"only integer or float list columns supported, got {t}"
            )
        if t.value_type == pa.float16():
            raise EncodeTypeError("float16 lists are not supported; cast to float32")
        # lengths stream (null slot -> 0) + flattened child values
        lengths = np.zeros(n, dtype=np.int64)
        valid_arr = arr.drop_null() if mask is not None else arr
        offs = np.asarray(valid_arr.offsets)
        lens_valid = np.diff(offs)
        if mask is not None:
            lengths[mask] = lens_valid
        else:
            lengths = lens_valid
        child = valid_arr.flatten()
        if child.null_count:
            raise EncodeTypeError("nulls inside list values are not supported")
        values = np.asarray(child)
        lmeta, lblob = encode_values("for", lengths)
        if pa.types.is_floating(t.value_type):
            # float lists (embedding columns): flattened values ride the
            # float codec family — see _encode_float_values
            resolved, vmeta, vblob = _encode_float_values(codec, values, cascade)
            kind = "list_float"
        else:
            resolved = _resolve_int(codec, values)
            vmeta, vblob = encode_values(resolved, values)
            kind = "list_int"
        meta = {
            "kind": kind,
            "fmt": BLOCK_FORMAT_VERSION,
            "n": n,
            "value_dtype": str(t.value_type),
            "lengths_meta": lmeta,
            "values_meta": vmeta,
            "lengths_len": len(lblob),
            "validity_len": len(validity),
        }
        return resolved, json.dumps(meta), validity + lblob + vblob

    if pa.types.is_string(t) or pa.types.is_large_string(t):
        valid_arr = arr.drop_null() if mask is not None else arr
        sd = strdata_from_arrow(valid_arr)
        resolved = choose_str_codec(sd) if codec == "auto" else codec
        if resolved == "seq_str":
            from xml2arrow_spark.codecs.strings import seq_str_probe

            if sd.n and seq_str_probe(sd) is None:
                # sample said seq_str, this block's strings say no — re-choose
                resolved = choose_str_codec(sd)
        smeta, sblob = encode_values(resolved, sd)
        meta = {
            "kind": "str",
            "fmt": BLOCK_FORMAT_VERSION,
            "n": n,
            "large": pa.types.is_large_string(t),
            "str_meta": smeta,
            "validity_len": len(validity),
        }
        return resolved, json.dumps(meta), validity + sblob

    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        # temporal columns ride the integer codec family: the physical
        # value IS an epoch count (timestamp -> its unit's ticks as int64,
        # date32 -> days as int32), and event times are exactly where
        # delta/FOR shine. The ORIGINAL arrow type (unit + tz) is recorded
        # in the header and reproduced bit-identically at decode — the
        # engine never reinterprets an instant across timezones.
        if t == pa.date64():
            raise EncodeTypeError(
                "date64 is not supported (Spark produces date32); cast first"
            )
        if pa.types.is_timestamp(t):
            lt = {"lt": "timestamp", "unit": t.unit, "tz": t.tz}
            storage = pa.int64()
        else:
            lt = {"lt": "date32"}
            storage = pa.int32()
        valid_arr = arr.drop_null() if mask is not None else arr
        values = np.asarray(valid_arr.cast(storage))
        resolved = _resolve_int(codec, values)
        vmeta, vblob = encode_values(resolved, values)
        meta = {
            "kind": "temporal",
            "fmt": BLOCK_FORMAT_VERSION,
            "n": n,
            **lt,
            "values_meta": vmeta,
            "validity_len": len(validity),
        }
        return resolved, json.dumps(meta), validity + vblob

    if pa.types.is_integer(t):
        valid_arr = arr.drop_null() if mask is not None else arr
        values = np.asarray(valid_arr)
        resolved = _resolve_int(codec, values)
        vmeta, vblob = encode_values(resolved, values)
        meta = {
            "kind": "int",
            "fmt": BLOCK_FORMAT_VERSION,
            "n": n,
            "dtype": str(t),
            "values_meta": vmeta,
            "validity_len": len(validity),
        }
        return resolved, json.dumps(meta), validity + vblob

    if pa.types.is_floating(t):
        if t == pa.float16():
            raise EncodeTypeError("float16 is not supported; cast to float32")
        valid_arr = arr.drop_null() if mask is not None else arr
        values = np.asarray(valid_arr)
        # ALP-style decimal probe with the never-silently-corrupt plain
        # fallback — shared with the float-LIST path (_encode_float_values)
        resolved, vmeta, vblob = _encode_float_values(codec, values, cascade)
        meta = {
            "kind": "float",
            "fmt": BLOCK_FORMAT_VERSION,
            "n": n,
            "dtype": str(t),
            "values_meta": vmeta,
            "validity_len": len(validity),
        }
        return resolved, json.dumps(meta), validity + vblob

    if pa.types.is_boolean(t):
        valid_arr = arr.drop_null() if mask is not None else arr
        values = np.asarray(valid_arr)
        resolved = "bool_pack" if codec == "auto" else codec
        vmeta, vblob = encode_values(resolved, values)
        meta = {
            "kind": "bool",
            "fmt": BLOCK_FORMAT_VERSION,
            "n": n,
            "values_meta": vmeta,
            "validity_len": len(validity),
        }
        return resolved, json.dumps(meta), validity + vblob

    if pa.types.is_decimal(t):
        # UInt64's widened Spark type is Decimal(20,0) (types.py) — the full
        # 0..2^64-1 range rides the integer-codec family as the low 64 bits
        # of the decimal128 storage, bit-cast to int64 (two's-complement
        # wraparound is self-inverse, so FOR/delta/dict round-trip exactly).
        # Values outside [0, 2^64) are REJECTED, not truncated — the
        # reference's full-range contract (/root/reference/src/config.rs:544-559).
        if t.scale != 0:
            raise EncodeTypeError(
                f"only scale-0 decimal columns are encodable (the UInt64 "
                f"widening type); got {t}"
            )
        valid_arr = arr.drop_null() if mask is not None else arr
        nv = len(valid_arr)
        raw = np.frombuffer(valid_arr.buffers()[1], dtype=np.uint64)
        raw = raw[2 * valid_arr.offset : 2 * (valid_arr.offset + nv)]
        lo, hi = raw[0::2], raw[1::2]
        if nv and hi.any():
            raise EncodeValueError(
                f"column of type {t}: values outside [0, 2^64) cannot be "
                f"encoded (UInt64 widening contract; no silent truncation)"
            )
        values = np.ascontiguousarray(lo).view(np.int64)
        resolved = _resolve_int(codec, values)
        vmeta, vblob = encode_values(resolved, values)
        meta = {
            "kind": "dec128",
            "fmt": BLOCK_FORMAT_VERSION,
            "n": n,
            "precision": t.precision,
            "values_meta": vmeta,
            "validity_len": len(validity),
        }
        return resolved, json.dumps(meta), validity + vblob

    raise EncodeTypeError(f"unsupported column type for encoding: {t}")


def _unpack_validity(meta: dict, payload: bytes) -> tuple[np.ndarray | None, bytes]:
    vlen = meta.get("validity_len", 0)
    if not vlen:
        return None, payload
    mask = np.unpackbits(np.frombuffer(payload[:vlen], dtype=np.uint8))[: meta["n"]].astype(bool)
    return mask, payload[vlen:]


_PA_INT = {
    "int8": pa.int8(),
    "int16": pa.int16(),
    "int32": pa.int32(),
    "int64": pa.int64(),
}


def _verify_block_header(meta: dict, payload: bytes) -> None:
    """Format + storage-integrity gate shared by every block reader."""
    if meta.get("fmt", 1) != BLOCK_FORMAT_VERSION:
        raise BlockCorruptionError(
            f"block format {meta.get('fmt', 1)} != engine format "
            f"{BLOCK_FORMAT_VERSION}; re-encode the dataset"
        )
    # storage-integrity gate (see _stamp_crc): headers without a crc are
    # pre-r05 blocks and stay readable; a header WITH a crc is binding
    if "crc" in meta and zlib.crc32(payload) != meta["crc"]:
        raise BlockCorruptionError(
            f"block payload CRC mismatch (column {meta.get('kind')!r}, "
            f"{len(payload)} bytes): stored bytes are corrupt; refusing to "
            f"decode silently wrong values"
        )


def decode_column(meta_json: str, payload: bytes) -> pa.Array:
    """Exact inverse of :func:`encode_column`."""
    meta = json.loads(meta_json)
    _verify_block_header(meta, payload)
    kind = meta["kind"]
    if kind == "general":
        raw = pa.Codec(meta["g"]).decompress(
            payload, decompressed_size=meta["raw_len"], asbytes=True
        )
        return decode_column(meta["inner"], raw)
    mask, payload = _unpack_validity(meta, payload)
    n = meta["n"]

    if kind in ("list_int", "list_float"):
        llen = meta["lengths_len"]
        lengths = decode_values(meta["lengths_meta"], payload[:llen])
        values = decode_values(meta["values_meta"], payload[llen:])
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lengths, out=offsets[1:])
        if offsets[-1] > np.iinfo(np.int32).max:
            raise EncodeValueError("block too large for int32 list offsets; lower block_rows")
        if kind == "list_float":
            vtype = pa.float32() if meta["value_dtype"] == "float" else pa.float64()
            if values.dtype != np.dtype(
                np.float32 if meta["value_dtype"] == "float" else np.float64
            ):
                values = values.astype(
                    np.float32 if meta["value_dtype"] == "float" else np.float64
                )
        else:
            vtype = _PA_INT[meta["value_dtype"]]
        child = pa.array(values, type=vtype)
        return pa.Array.from_buffers(
            pa.list_(vtype),
            n,
            [_validity_buffer(mask), pa.py_buffer(offsets.astype(np.int32).tobytes())],
            children=[child],
        )

    if kind == "str":
        sd = decode_values(meta["str_meta"], payload)
        if mask is None:
            return strdata_to_arrow(sd, large=meta.get("large", False))
        return _expand_str_nulls(sd, mask, large=meta.get("large", False))

    if kind == "int":
        values = decode_values(meta["values_meta"], payload)
        if mask is None:
            return pa.array(values, type=_PA_INT[meta["dtype"]])
        full = np.zeros(n, dtype=values.dtype)
        full[mask] = values
        return pa.array(full, type=_PA_INT[meta["dtype"]], mask=~mask)

    if kind == "temporal":
        values = decode_values(meta["values_meta"], payload)
        if meta["lt"] == "timestamp":
            typ = pa.timestamp(meta["unit"], tz=meta["tz"])
        else:
            typ = pa.date32()
            values = values.astype(np.int32, copy=False)  # arrow refuses int64->date32
        if mask is None:
            return pa.array(values, type=typ)
        full = np.zeros(n, dtype=values.dtype)
        full[mask] = values
        return pa.array(full, type=typ, mask=~mask)

    if kind == "float":
        values = decode_values(meta["values_meta"], payload)
        typ = pa.float32() if meta["dtype"] == "float" else pa.float64()
        if mask is None:
            return pa.array(values, type=typ)
        full = np.zeros(n, dtype=values.dtype)
        full[mask] = values
        return pa.array(full, type=typ, mask=~mask)

    if kind == "bool":
        values = decode_values(meta["values_meta"], payload)
        if mask is None:
            return pa.array(values, type=pa.bool_())
        full = np.zeros(n, dtype=np.bool_)
        full[mask] = values
        return pa.array(full, type=pa.bool_(), mask=~mask)

    if kind == "dec128":
        # exact inverse of the encode-side bit-cast: int64 -> uint64 low
        # half, high half zero (values are guaranteed in [0, 2^64))
        values = decode_values(meta["values_meta"], payload).astype(np.int64)
        u = values.view(np.uint64)
        if mask is None:
            full = u
            vbuf = None
        else:
            full = np.zeros(n, dtype=np.uint64)
            full[mask] = u
            vbuf = _validity_buffer(mask)
        data = np.zeros(2 * n, dtype=np.uint64)
        data[0::2] = full
        return pa.Array.from_buffers(
            pa.decimal128(meta["precision"], 0), n, [vbuf, pa.py_buffer(data.tobytes())]
        )

    raise BlockCorruptionError(f"unknown column kind {kind!r}")


def row_match_mask(arr: pa.Array, values, lo, hi):
    """Boolean match mask for the filter column, or None if no row matches
    (block skip). Null values never match; NaN never matches a finite
    range (IEEE comparisons). Temporal columns compare as epoch ticks in
    their storage unit (timestamp -> unit count, date32 -> days) — bounds
    and IN-list values may be those integers or datetime/date objects
    (converted through pyarrow's scalar semantics)."""
    import pyarrow.compute as pc

    if pa.types.is_timestamp(arr.type) or pa.types.is_date(arr.type):
        t = arr.type
        itype = pa.int64() if pa.types.is_timestamp(t) else pa.int32()

        def _tick(b):
            if b is None or isinstance(b, int):
                return b
            return pa.scalar(b, type=t).cast(itype).as_py()

        lo, hi = _tick(lo), _tick(hi)
        if values is not None:
            values = [_tick(v) for v in values]
        arr = arr.cast(itype)
        if itype != pa.int64():
            arr = arr.cast(pa.int64())

    if values is not None:
        mask = pc.is_in(arr, value_set=pa.array(values).cast(arr.type)).fill_null(
            False
        )
    else:
        mask = None
        if lo is not None:
            mask = pc.greater_equal(arr, pa.scalar(lo))
        if hi is not None:
            mh = pc.less_equal(arr, pa.scalar(hi))
            mask = mh if mask is None else pc.and_kleene(mask, mh)
        mask = pc.fill_null(mask, False)
    if not pc.any(mask).as_py():
        return None
    return mask


def _gather_strdata(sd: StrData, idx: np.ndarray) -> StrData:
    """Gather rows ``idx`` out of a StrData stream (row order preserved by
    the caller). Same flattened repeat+cumsum byte gather as dict_str
    decode, over the selected rows only."""
    lengths = sd.lengths()
    out_lengths = lengths[idx]
    offsets = np.zeros(idx.size + 1, dtype=np.int64)
    np.cumsum(out_lengths, out=offsets[1:])
    total = int(offsets[-1])
    if total:
        data_arr = np.frombuffer(sd.data, dtype=np.uint8)
        starts = sd.offsets[idx]
        row_of = np.repeat(np.arange(idx.size), out_lengths)
        j = np.arange(total, dtype=np.int64)
        src = starts[row_of] + (j - offsets[row_of])
        data = data_arr[src].tobytes()
    else:
        data = b""
    return StrData(offsets=offsets, data=data)


def value_counts_column(meta_json: str, payload: bytes, mask=None):
    """Exact per-block GROUP BY counts for one encoded column: returns
    ``(values, counts, n_null)`` where ``values`` is a pyarrow array of
    NON-NULL values from this block (distinct when ``mask`` is None; the
    masked path MAY repeat a value — RLE run values are not uniqued —
    and callers fold tallies by value), ``counts`` an int64 numpy array
    aligned with it, and ``n_null`` the block's null count.

    ``mask`` (optional numpy/pyarrow boolean array over the block's rows,
    no nulls) restricts the tally to the selected rows — the filtered
    GROUP BY COUNT shape: rows where the mask is False contribute to no
    value's count and not to ``n_null``, exactly as SQL's ``WHERE`` runs
    before ``GROUP BY``. Rides :func:`group_codes_column`, so the key
    values still never materialize per row for dict/rle/dict_str codecs.

    Codec-aware: ``dict``/``dict_str`` bincount the code stream against
    the dictionary, ``rle`` folds run lengths per run value, ``pdict``
    bincounts the code stream over the top table and uniques the (small)
    exception stream — none of them materialize the value stream
    (operating on compressed data, Abadi et al., SIGMOD 2006). Every
    other integer/string/bool/decimal codec decodes and counts. Float
    kinds are REFUSED: NaN != NaN under IEEE but SQL GROUP BY groups
    NaNs together, so a float group-by cannot be reproduced portably —
    the caller gets an error, never engine-defined groups.

    Exactness pinned against decode + pyarrow value_counts in
    tests/test_match_decode.py for every codec and null mix.
    """
    import pyarrow.compute as pc

    if mask is not None:
        dictionary, codes = group_codes_column(meta_json, payload)
        m = np.asarray(mask, dtype=bool)
        if m.size != codes.size:
            raise BlockCorruptionError(
                f"row mask and block disagree on row count "
                f"({m.size} vs {codes.size})"
            )
        K = len(dictionary)
        cnt = np.bincount(codes[m], minlength=K + 1).astype(np.int64)
        keep = cnt[:K] > 0
        return (
            dictionary.take(pa.array(np.nonzero(keep)[0], type=pa.int64())),
            cnt[:K][keep],
            int(cnt[K]),
        )

    meta = json.loads(meta_json)
    _verify_block_header(meta, payload)
    if meta["kind"] == "general":
        raw = pa.Codec(meta["g"]).decompress(
            payload, decompressed_size=meta["raw_len"], asbytes=True
        )
        return value_counts_column(meta["inner"], raw)
    kind = meta["kind"]
    if kind in ("float", "list_float"):
        raise EncodeTypeError(
            "group-by counts over float columns are refused: SQL groups "
            "NaNs together but IEEE equality does not, so the result "
            "would be engine-defined; group on an integer/string column"
        )
    if kind == "list_int":
        raise EncodeTypeError(
            "group-by counts need a scalar key column, got a list column"
        )

    if kind in ("int", "str"):
        from xml2arrow_spark.codecs import bitpack
        from xml2arrow_spark.codecs.base import INT_DTYPES, split_sections

        vmask, vpayload = _unpack_validity(meta, payload)
        n_null = 0 if vmask is None else int(meta["n"] - vmask.sum())

        if kind == "int":
            vm = meta["values_meta"]
            pa_type = _PA_INT[meta["dtype"]]
            if vm["codec"] == "dict":
                from xml2arrow_spark.codecs.integers import _for_unpack

                np_dtype = INT_DTYPES[vm["dtype"]]
                parts = split_sections(vm, vpayload)
                uniq = _for_unpack(parts["dict"], vm["card"], vm["uref"], vm["uwidth"])
                idx = bitpack.unpack_uint(
                    parts["indices"], vm["n"], vm["iwidth"]
                ).astype(np.int64)
                counts = np.bincount(idx, minlength=vm["card"]).astype(np.int64)
                return (
                    pa.array(uniq.astype(np_dtype), type=pa_type),
                    counts,
                    n_null,
                )
            if vm["codec"] == "rle":
                from xml2arrow_spark.codecs.integers import _for_unpack

                np_dtype = INT_DTYPES[vm["dtype"]]
                parts = split_sections(vm, vpayload)
                k = vm["n_runs"]
                run_values = _for_unpack(
                    parts["run_values"], k, vm["vref"], vm["vwidth"]
                )
                run_lengths = _for_unpack(
                    parts["run_lengths"], k, vm["lref"], vm["lwidth"]
                )
                uniq, inverse = np.unique(run_values, return_inverse=True)
                counts = np.zeros(uniq.size, dtype=np.int64)
                np.add.at(counts, inverse, run_lengths)
                return (
                    pa.array(uniq.astype(np_dtype), type=pa_type),
                    counts,
                    n_null,
                )
            if vm["codec"] == "pdict" and vm["n"]:
                np_dtype = INT_DTYPES[vm["dtype"]]
                parts = split_sections(vm, vpayload)
                top = bitpack.unpack_uint(
                    parts["dict"], vm["n_dict"], vm["w_exc"]
                ).astype(np.int64)
                codes = bitpack.unpack_uint(parts["codes"], vm["n"], vm["w"]).astype(
                    np.int64
                )
                escape = (1 << vm["w"]) - 1
                # top codes are 0..n_dict-1; the escape slot's tally is the
                # exception-row count, not a dictionary value's
                cc = np.bincount(codes, minlength=escape + 1).astype(np.int64)
                vals = [(top + vm["ref"]).astype(np_dtype)]
                cnts = [cc[: vm["n_dict"]]]
                if vm["n_exc"]:
                    exc = bitpack.unpack_uint(
                        parts["exceptions"], vm["n_exc"], vm["w_exc"]
                    ).astype(np.int64)
                    euniq, ecnt = np.unique(
                        (exc + vm["ref"]).astype(np_dtype), return_counts=True
                    )
                    vals.append(euniq)
                    cnts.append(ecnt.astype(np.int64))
                return (
                    pa.array(np.concatenate(vals), type=pa_type),
                    np.concatenate(cnts),
                    n_null,
                )
        elif kind == "str":
            sm = meta["str_meta"]
            if sm["codec"] == "dict_str":
                from xml2arrow_spark.codecs.strings import decode_plain_str

                parts = split_sections(sm, vpayload)
                dict_sd = decode_plain_str(sm["dict_meta"], parts["dict"])
                idx = bitpack.unpack_uint(
                    parts["indices"], sm["n"], sm["iwidth"]
                ).astype(np.int64)
                counts = np.bincount(idx, minlength=dict_sd.n).astype(np.int64)
                return (
                    strdata_to_arrow(dict_sd, large=meta.get("large", False)),
                    counts,
                    n_null,
                )

    # no codec shortcut: decode and count (same kernels, same result)
    arr = decode_column(meta_json, payload)
    n_null = arr.null_count
    vc = pc.value_counts(arr.drop_null())
    return vc.field("values"), vc.field("counts").to_numpy().astype(np.int64), n_null


def group_codes_column(meta_json: str, payload: bytes):
    """Per-row GROUP codes for one encoded column: returns ``(dictionary,
    codes)`` where ``dictionary`` is a pyarrow array of candidate key
    values (it MAY contain duplicates — RLE run values are not uniqued;
    callers fold tallies by value) and ``codes`` an int64 numpy array of
    length n_rows mapping EVERY row to a dictionary slot, with
    ``len(dictionary)`` as the dedicated NULL-group slot.

    Codec-aware: ``dict``/``dict_str`` lift the code stream directly and
    ``rle`` repeats run indices — the key values never materialize per row
    (operating on compressed data, Abadi et al., SIGMOD 2006); every other
    codec decodes and dictionary-encodes, which yields the identical
    grouping. Float and list kinds are refused with the same portability
    rule as :func:`value_counts_column` (SQL groups NaNs together, IEEE
    equality does not).
    """
    import pyarrow.compute as pc

    meta = json.loads(meta_json)
    _verify_block_header(meta, payload)
    if meta["kind"] == "general":
        raw = pa.Codec(meta["g"]).decompress(
            payload, decompressed_size=meta["raw_len"], asbytes=True
        )
        return group_codes_column(meta["inner"], raw)
    kind = meta["kind"]
    if kind in ("float", "list_float"):
        raise EncodeTypeError(
            "group-by over float columns is refused: SQL groups NaNs "
            "together but IEEE equality does not, so the result would be "
            "engine-defined; group on an integer/string column"
        )
    if kind == "list_int":
        raise EncodeTypeError(
            "group-by needs a scalar key column, got a list column"
        )

    def _expand(dictionary, nonnull_codes, vmask, n):
        if vmask is None:
            return dictionary, nonnull_codes
        codes = np.full(n, len(dictionary), dtype=np.int64)
        codes[vmask] = nonnull_codes
        return dictionary, codes

    if kind in ("int", "str"):
        from xml2arrow_spark.codecs import bitpack
        from xml2arrow_spark.codecs.base import INT_DTYPES, split_sections

        vmask, vpayload = _unpack_validity(meta, payload)
        if kind == "int":
            vm = meta["values_meta"]
            pa_type = _PA_INT[meta["dtype"]]
            if vm["codec"] == "dict":
                from xml2arrow_spark.codecs.integers import _for_unpack

                np_dtype = INT_DTYPES[vm["dtype"]]
                parts = split_sections(vm, vpayload)
                uniq = _for_unpack(parts["dict"], vm["card"], vm["uref"], vm["uwidth"])
                idx = bitpack.unpack_uint(
                    parts["indices"], vm["n"], vm["iwidth"]
                ).astype(np.int64)
                return _expand(
                    pa.array(uniq.astype(np_dtype), type=pa_type),
                    idx, vmask, meta["n"],
                )
            if vm["codec"] == "rle":
                from xml2arrow_spark.codecs.integers import _for_unpack

                np_dtype = INT_DTYPES[vm["dtype"]]
                parts = split_sections(vm, vpayload)
                k = vm["n_runs"]
                run_values = _for_unpack(
                    parts["run_values"], k, vm["vref"], vm["vwidth"]
                )
                run_lengths = _for_unpack(
                    parts["run_lengths"], k, vm["lref"], vm["lwidth"]
                )
                idx = np.repeat(np.arange(k, dtype=np.int64), run_lengths)
                return _expand(
                    pa.array(run_values.astype(np_dtype), type=pa_type),
                    idx, vmask, meta["n"],
                )
        elif kind == "str":
            sm = meta["str_meta"]
            if sm["codec"] == "dict_str":
                from xml2arrow_spark.codecs.strings import decode_plain_str

                parts = split_sections(sm, vpayload)
                dict_sd = decode_plain_str(sm["dict_meta"], parts["dict"])
                idx = bitpack.unpack_uint(
                    parts["indices"], sm["n"], sm["iwidth"]
                ).astype(np.int64)
                return _expand(
                    strdata_to_arrow(dict_sd, large=meta.get("large", False)),
                    idx, vmask, meta["n"],
                )

    # no codec shortcut: decode and dictionary-encode (same grouping)
    arr = decode_column(meta_json, payload)
    darr = pc.dictionary_encode(arr)
    dictionary = darr.dictionary
    codes = (
        darr.indices.fill_null(len(dictionary))
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    return dictionary, codes


def composite_value_counts(key_pairs, mask=None):
    """Exact per-block GROUP BY counts over a COMPOSITE key: ``key_pairs``
    is a list of (meta_json, payload) — one per key column — and the
    result is ``{(v1, v2, ...): count}`` over the block's (masked) rows,
    with ``None`` components for NULL key values (SQL: every NULL
    combination is its own group).

    Each column's group codes ride :func:`group_codes_column`
    (dict/rle/dict_str code streams — no per-row key materialization);
    the codes combine positionally into one mixed-radix code
    (``c = c1 * (K2+1) + c2 ...``, the +1 radix slot being each column's
    NULL group), so the composite tally is one ``np.unique`` over an
    int64 stream no matter how many key columns — never a per-row tuple
    build. Refusals (float/list keys) come from group_codes_column.
    """
    dicts = []
    combined = None
    n = None
    for meta, data in key_pairs:
        d, c = group_codes_column(meta, data)
        if n is None:
            n = c.size
        elif c.size != n:
            raise BlockCorruptionError(
                f"composite key blocks disagree on row count ({n} vs {c.size})"
            )
        dicts.append(d.to_pylist() + [None])
        combined = c if combined is None else combined * len(dicts[-1]) + c
    if mask is not None:
        mask = np.asarray(mask, dtype=bool)
        if mask.size != n:
            raise BlockCorruptionError(
                f"row mask and key blocks disagree on row count "
                f"({mask.size} vs {n})"
            )
        combined = combined[mask]
    slots, counts = np.unique(combined, return_counts=True)
    out: dict = {}
    for slot, cnt in zip(slots.tolist(), counts.tolist()):
        parts = []
        for d in reversed(dicts):
            slot, j = divmod(slot, len(d))
            parts.append(d[j])
        key = tuple(reversed(parts))
        out[key] = out.get(key, 0) + cnt  # RLE dup dictionary slots fold
    return out


def composite_group_codes(key_pairs):
    """COMPOSITE per-row group codes: mixed-radix combination of each key
    column's codec-stream codes (:func:`group_codes_column`; the +1 radix
    slot per column is its NULL group), compacted with one ``np.unique``
    so downstream folds never allocate the full radix product. Returns
    ``(keys, codes)`` — ``keys[j]`` the decoded key TUPLE of compact slot
    ``j`` (None components for NULLs), ``codes`` int64 per row."""
    dicts = []
    combined = None
    n = None
    for meta, data in key_pairs:
        d, c = group_codes_column(meta, data)
        if n is None:
            n = c.size
        elif c.size != n:
            raise BlockCorruptionError(
                f"composite key blocks disagree on row count ({n} vs {c.size})"
            )
        dicts.append(d.to_pylist() + [None])
        combined = c if combined is None else combined * len(dicts[-1]) + c
    slots, codes = np.unique(combined, return_inverse=True)
    keys = []
    for slot in slots.tolist():
        parts = []
        for d in reversed(dicts):
            slot, j = divmod(slot, len(d))
            parts.append(d[j])
        keys.append(tuple(reversed(parts)))
    return keys, codes.astype(np.int64)


def composite_group_aggs(key_pairs, aggs, mask=None, with_sq=False):
    """:func:`group_aggs_column` over a COMPOSITE key: same per-agg
    semantics (exact hi/lo folds, NULL-skipping counts), keyed by tuples
    via the compacted mixed-radix codes — "tokens + chars per (source,
    language)" in one pass over the key code streams + agg streams."""
    keys, codes = composite_group_codes(key_pairs)
    return _fold_group_aggs(keys, codes, aggs, mask, with_sq=with_sq)


def group_aggs_column(key_meta: str, key_data: bytes, aggs, mask=None,
                      with_sq=False):
    """Exact per-block grouped COUNT plus per-agg (n_nonnull, SUM, MIN,
    MAX) for one key column and SEVERAL agg columns in ONE pass: returns
    ``{key_value_or_None: [cnt, (nn, sum, mn, mx), (nn, sum, mn, mx), ...]}``
    with one 4-tuple per entry of ``aggs`` (a list of (meta_json, payload)
    pairs). The key's group codes are computed ONCE
    (:func:`group_codes_column` — dict/rle/dict_str code streams, no key
    materialization) and shared by every agg fold; each agg column decodes
    once — the one-scan multi-aggregate accounting shape ("rows, tokens,
    chars per source" prices one key stream + m agg streams, not m scans).

    Per-agg semantics are :func:`group_sum_column`'s exactly: ``cnt`` is
    SQL COUNT(*) of the (masked) group, ``nn`` counts non-NULL agg rows,
    ``sum`` is the exact python-int fold via the hi/lo 32-bit split (0
    when nn is 0 — the caller maps that to SQL's NULL), ``mn``/``mx`` are
    None when nn is 0. ``mask`` restricts every tally to the selected
    rows (WHERE before GROUP BY). Integer agg columns only; float folds
    are order-dependent and refused.

    ``with_sq=True`` appends an exact sum of SQUARES to every agg tuple
    (-> 5-tuples ``(nn, sum, mn, mx, sumsq)``): each |value| must stay
    <= floor(sqrt(2^63-1)) so the per-element square fits int64 (any
    larger value REFUSES — the ANSI no-silent-wrap contract; a sum of
    squares cannot be range-split the way the linear sum can), then the
    squares fold through the same exact hi/lo split. Sum + sum-of-squares
    + count make variance/stddev exactly derivable by the caller.
    """
    dictionary, codes = group_codes_column(key_meta, key_data)
    return _fold_group_aggs(dictionary.to_pylist() + [None], codes, aggs, mask,
                            with_sq=with_sq)


_SQ_BOUND = 3037000499  # floor(sqrt(2^63 - 1)): squares provably fit int64


def _fold_group_aggs(keys, codes, aggs, mask=None, with_sq=False):
    """Shared grouped-aggregate fold: ``keys`` maps slot -> key object
    (single values for one key column, tuples for composite keys; slots
    MAY repeat a key — RLE run values — and fold by value), ``codes`` maps
    every row to a slot. Returns group_aggs_column's shape."""
    if mask is not None:
        mask = np.asarray(mask, dtype=bool)
        if mask.size != codes.size:
            raise BlockCorruptionError(
                f"row mask and key block disagree on row count "
                f"({mask.size} vs {codes.size})"
            )
    K = len(keys) - 1  # preserved naming: slots are 0..K
    cnt = np.bincount(codes if mask is None else codes[mask],
                      minlength=K + 1).astype(np.int64)

    per_agg = []
    for agg_meta, agg_data in aggs:
        arr = decode_column(agg_meta, agg_data)
        if not pa.types.is_integer(arr.type):
            raise EncodeTypeError(
                f"SUM pushdown needs an integer agg column, got {arr.type}: "
                "float folds are order-dependent and a metadata/kernel sum "
                "never approximates (same rule as count_where)"
            )
        if len(arr) != codes.size:
            raise BlockCorruptionError(
                f"key and agg blocks disagree on row count "
                f"({codes.size} vs {len(arr)})"
            )
        if arr.null_count:
            valid = np.asarray(arr.is_valid())
            if mask is not None:
                valid = valid & mask
            v = arr.fill_null(0).to_numpy()[valid]
            gcodes = codes[valid]
        elif mask is not None:
            v = arr.to_numpy()[mask]
            gcodes = codes[mask]
        else:
            v = arr.to_numpy()
            gcodes = codes
        nn = np.bincount(gcodes, minlength=K + 1).astype(np.int64)
        # exact signed/unsigned split: v == (v >> 32) * 2^32 + (v & 0xFFFFFFFF)
        # in two's complement; each half's per-group fold fits int64 for any
        # block size (|hi| <= 2^32, lo < 2^32)
        if v.dtype == np.uint64:
            hi = (v >> np.uint64(32)).astype(np.int64)
            lo = (v & np.uint64(0xFFFFFFFF)).astype(np.int64)
        else:
            v64 = v.astype(np.int64)
            hi = v64 >> 32
            lo = v64 & 0xFFFFFFFF
        # NOTE (r06): a bincount(weights=) variant of these folds measured
        # 4.7x SLOWER at the 8192-row/4-group block geometry — this
        # numpy's ufunc.at has an indexed-loop fast path, and the float
        # weight conversion + argsort for extrema cost more than they
        # save. Keep the ufunc.at folds.
        hi_acc = np.zeros(K + 1, dtype=np.int64)
        lo_acc = np.zeros(K + 1, dtype=np.int64)
        np.add.at(hi_acc, gcodes, hi)
        np.add.at(lo_acc, gcodes, lo)
        sq_hi_acc = sq_lo_acc = None
        if with_sq:
            if v.size and (
                int(v.max(initial=0)) > _SQ_BOUND
                or (v.dtype != np.uint64 and int(v.min(initial=0)) < -_SQ_BOUND)
            ):
                raise ArithmeticError(
                    f"sum-of-squares needs |value| <= {_SQ_BOUND} so each "
                    f"square fits int64; refusing rather than wrapping "
                    f"(ANSI contract)"
                )
            sq = (v.astype(np.int64) * v.astype(np.int64))  # provably exact
            sq_hi = sq >> 32
            sq_lo = sq & 0xFFFFFFFF
            sq_hi_acc = np.zeros(K + 1, dtype=np.int64)
            sq_lo_acc = np.zeros(K + 1, dtype=np.int64)
            np.add.at(sq_hi_acc, gcodes, sq_hi)
            np.add.at(sq_lo_acc, gcodes, sq_lo)
        # extrema in the value's native dtype (no overflow possible);
        # sentinel slots are masked off by nn==0 below
        info = np.iinfo(v.dtype)
        mn_acc = np.full(K + 1, info.max, dtype=v.dtype)
        mx_acc = np.full(K + 1, info.min, dtype=v.dtype)
        np.minimum.at(mn_acc, gcodes, v)
        np.maximum.at(mx_acc, gcodes, v)
        per_agg.append((nn, hi_acc, lo_acc, mn_acc, mx_acc,
                        sq_hi_acc, sq_lo_acc))

    out: dict = {}
    for g, kv in enumerate(keys):
        c = int(cnt[g])
        if not c:
            continue  # unoccupied slot (the null slot of a null-free block)
        trips = []
        for nn, hi_acc, lo_acc, mn_acc, mx_acc, sq_hi_acc, sq_lo_acc in per_agg:
            nng = int(nn[g])
            trip = (
                nng,
                (int(hi_acc[g]) << 32) + int(lo_acc[g]),
                int(mn_acc[g]) if nng else None,
                int(mx_acc[g]) if nng else None,
            )
            if with_sq:
                trip += ((int(sq_hi_acc[g]) << 32) + int(sq_lo_acc[g]),)
            trips.append(trip)
        prev = out.get(kv)
        if prev is None:
            out[kv] = [c] + trips
        else:  # duplicate dictionary slots (RLE run values) fold by value
            prev[0] += c
            for i, t in enumerate(trips, start=1):
                nng, sm, mn, mx = t[:4]
                p = prev[i]
                pn, ps, pm, px = p[:4]
                pn += nng
                ps += sm
                if mn is not None:
                    pm = mn if pm is None else min(pm, mn)
                    px = mx if px is None else max(px, mx)
                merged = (pn, ps, pm, px)
                if with_sq:
                    merged += (p[4] + t[4],)
                prev[i] = merged
    return out


def group_sum_column(key_meta: str, key_data: bytes, agg_meta: str, agg_data: bytes,
                     mask=None):
    """Exact per-block grouped COUNT/SUM/MIN/MAX for one (key, agg) column
    pair: returns ``{key_value_or_None: [cnt, n_nonnull, sum, min, max]}``
    over the block's rows, where ``cnt`` counts every row of the group
    (SQL ``COUNT(*)``), ``n_nonnull`` the rows whose agg value is
    non-NULL, ``sum`` the exact python-int sum of those values (0 when
    n_nonnull is 0; the CALLER maps that to SQL's NULL — python ints so a
    block of int64 extremes can never silently wrap), and ``min``/``max``
    the group's extrema (None when n_nonnull is 0). ``None`` keys are the
    NULL group.

    ``mask`` (optional numpy/pyarrow boolean array over the block's rows,
    no nulls) restricts the tally to the selected rows — the filtered
    GROUP BY shape: rows where the mask is False contribute to NO group,
    and a group with zero selected rows is absent from the result, exactly
    as SQL's ``WHERE`` runs before ``GROUP BY``.

    The single-agg view of :func:`group_aggs_column` (the key side rides
    group_codes_column — no key materialization; the agg side decodes
    once and folds through the exact hi/lo 32-bit split); kept as the
    stable kernel API and pinned per codec in tests/test_match_decode.py.
    """
    out = group_aggs_column(key_meta, key_data, [(agg_meta, agg_data)],
                            mask=mask)
    return {
        kv: [c, nng, sm, mn, mx]
        for kv, (c, (nng, sm, mn, mx)) in (
            (kv, (row[0], row[1])) for kv, row in out.items()
        )
    }


def match_decode_column(meta_json: str, payload: bytes, values, lo, hi):
    """Fused ``row_match_mask(decode_column(...))`` + selected
    materialization: returns ``None`` when NO row of the block matches the
    predicate (block skip), else ``(mask, selected)`` where ``mask`` is a
    pyarrow boolean array over the block's rows and ``selected`` equals
    ``decode_column(meta_json, payload).filter(mask)`` value-for-value
    (pinned by tests/test_match_decode.py).

    For dictionary- and run-compressed codecs the predicate is evaluated
    once per DISTINCT VALUE (``dict``/``pdict``/``dict_str``) or per RUN
    (``rle``) — through the SAME pyarrow kernels the row path uses, so the
    semantics (type casts, null handling, string collation) cannot drift —
    and mapped onto rows through the integer code stream: a zero-match
    block skips without materializing a single value, and a matching
    ``dict``/``rle``/``dict_str`` block gathers ONLY the selected rows
    (operating on compressed data, Abadi et al., "Integrating Compression
    and Execution in Column-Oriented Database Systems", SIGMOD 2006; the
    reference's analog is its refusal to build columns a query never
    reads, /root/reference/src/xml_parser.rs:1061-1110). Every other
    codec falls back to decode + mask — identical result, no shortcut.
    """
    out = _match_column_impl(meta_json, payload, values, lo, hi, True)
    return out


def match_mask_column(meta_json: str, payload: bytes, values, lo, hi):
    """Mask-only variant of :func:`match_decode_column` — same codec-aware
    evaluation and identical mask semantics, but never materializes the
    selected rows (the count/aggregate-pushdown shape: the caller needs
    how MANY or WHICH rows match, not their values). Returns ``None`` when
    no row matches, else a pyarrow boolean array over the block's rows."""
    out = _match_column_impl(meta_json, payload, values, lo, hi, False)
    return out if out is None else out[0]


def _match_column_impl(meta_json: str, payload: bytes, values, lo, hi,
                       want_selected: bool):
    meta = json.loads(meta_json)
    _verify_block_header(meta, payload)
    if meta["kind"] == "general":
        raw = pa.Codec(meta["g"]).decompress(
            payload, decompressed_size=meta["raw_len"], asbytes=True
        )
        return _match_column_impl(meta["inner"], raw, values, lo, hi,
                                  want_selected)

    dense = None  # match over the dense (non-null) value stream
    selected = None  # pre-gathered selected rows (fast paths that can)
    vmask = None
    kind = meta["kind"]

    if kind in ("int", "str"):
        from xml2arrow_spark.codecs import bitpack
        from xml2arrow_spark.codecs.base import INT_DTYPES, split_sections

        vmask, vpayload = _unpack_validity(meta, payload)

        if kind == "int":
            vm = meta["values_meta"]
            pa_type = _PA_INT[meta["dtype"]]
            if vm["codec"] == "dict":
                from xml2arrow_spark.codecs.integers import _for_unpack

                np_dtype = INT_DTYPES[vm["dtype"]]
                parts = split_sections(vm, vpayload)
                uniq = _for_unpack(parts["dict"], vm["card"], vm["uref"], vm["uwidth"])
                dmask = row_match_mask(
                    pa.array(uniq.astype(np_dtype), type=pa_type), values, lo, hi
                )
                if dmask is None:
                    return None
                dmatch = dmask.to_numpy(zero_copy_only=False)
                idx = bitpack.unpack_uint(
                    parts["indices"], vm["n"], vm["iwidth"]
                ).astype(np.int64)
                dense = dmatch[idx]
                if not dense.any():
                    return None
                if want_selected:
                    selected = pa.array(
                        uniq[idx[dense]].astype(np_dtype), type=pa_type
                    )
            elif vm["codec"] == "rle":
                from xml2arrow_spark.codecs.integers import _for_unpack

                np_dtype = INT_DTYPES[vm["dtype"]]
                parts = split_sections(vm, vpayload)
                k = vm["n_runs"]
                run_values = _for_unpack(
                    parts["run_values"], k, vm["vref"], vm["vwidth"]
                )
                rmask = row_match_mask(
                    pa.array(run_values.astype(np_dtype), type=pa_type), values, lo, hi
                )
                if rmask is None:
                    return None
                rmatch = rmask.to_numpy(zero_copy_only=False)
                run_lengths = _for_unpack(
                    parts["run_lengths"], k, vm["lref"], vm["lwidth"]
                )
                dense = np.repeat(rmatch, run_lengths)
                if not dense.any():
                    return None
                if want_selected:
                    # matching rows in row order == matching runs in run order
                    selected = pa.array(
                        np.repeat(run_values[rmatch], run_lengths[rmatch]).astype(
                            np_dtype
                        ),
                        type=pa_type,
                    )
            elif vm["codec"] == "pdict" and vm["n"]:
                np_dtype = INT_DTYPES[vm["dtype"]]
                parts = split_sections(vm, vpayload)
                top = bitpack.unpack_uint(
                    parts["dict"], vm["n_dict"], vm["w_exc"]
                ).astype(np.int64)
                # same wrap-then-cast arithmetic as decode_pdict
                dict_vals = (top + vm["ref"]).astype(np_dtype)
                dmask = row_match_mask(
                    pa.array(dict_vals, type=pa_type), values, lo, hi
                )
                emask = None
                if vm["n_exc"]:
                    exc = bitpack.unpack_uint(
                        parts["exceptions"], vm["n_exc"], vm["w_exc"]
                    ).astype(np.int64)
                    exc_vals = (exc + vm["ref"]).astype(np_dtype)
                    emask = row_match_mask(
                        pa.array(exc_vals, type=pa_type), values, lo, hi
                    )
                if dmask is None and emask is None:
                    # neither the dictionary nor the exception stream holds
                    # a match: skip before the code stream is even unpacked
                    return None
                codes = bitpack.unpack_uint(parts["codes"], vm["n"], vm["w"]).astype(
                    np.int64
                )
                escape = (1 << vm["w"]) - 1
                dense = np.zeros(vm["n"], dtype=bool)
                nonesc = codes != escape
                if dmask is not None:
                    dmatch = dmask.to_numpy(zero_copy_only=False)
                    dense[nonesc] = dmatch[codes[nonesc]]
                if emask is not None:
                    dense[~nonesc] = emask.to_numpy(zero_copy_only=False)
                if not dense.any():
                    return None
                # selected rows materialize via the decode fallback below
        elif kind == "str":
            sm = meta["str_meta"]
            if sm["codec"] == "dict_str":
                from xml2arrow_spark.codecs.strings import decode_plain_str

                parts = split_sections(sm, vpayload)
                dict_sd = decode_plain_str(sm["dict_meta"], parts["dict"])
                large = meta.get("large", False)
                dmask = row_match_mask(
                    strdata_to_arrow(dict_sd, large=large), values, lo, hi
                )
                if dmask is None:
                    return None
                dmatch = dmask.to_numpy(zero_copy_only=False)
                idx = bitpack.unpack_uint(
                    parts["indices"], sm["n"], sm["iwidth"]
                ).astype(np.int64)
                dense = dmatch[idx]
                if not dense.any():
                    return None
                if want_selected:
                    selected = strdata_to_arrow(
                        _gather_strdata(dict_sd, idx[dense]), large=large
                    )

    if dense is None:
        # no codec shortcut: decode + mask (the original path)
        arr = decode_column(meta_json, payload)
        mask = row_match_mask(arr, values, lo, hi)
        if mask is None:
            return None
        return mask, (arr.filter(mask) if want_selected else None)

    if vmask is None:
        full = dense
    else:
        full = np.zeros(meta["n"], dtype=bool)
        full[vmask] = dense
    mask = pa.array(full)
    if want_selected and selected is None:
        selected = decode_column(meta_json, payload).filter(mask)
    return mask, selected


def _validity_buffer(mask: np.ndarray | None):
    """Arrow validity bitmap buffer (bit=1 valid) from a boolean mask, or None."""
    if mask is None:
        return None
    return pa.py_buffer(np.packbits(mask, bitorder="little").tobytes())


def _expand_str_nulls(sd: StrData, mask: np.ndarray, large: bool) -> pa.Array:
    n = mask.size
    lengths = np.zeros(n, dtype=np.int64)
    lengths[mask] = sd.lengths()
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    typ = pa.large_utf8() if large else pa.utf8()
    odtype = np.int64 if large else np.int32
    return pa.Array.from_buffers(
        typ,
        n,
        [
            _validity_buffer(mask),
            pa.py_buffer(offsets.astype(odtype).tobytes()),
            pa.py_buffer(sd.data),
        ],
    )
