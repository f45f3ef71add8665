"""Vectorized (numpy) twins of the SQL text kernels in :mod:`sqlgen`.

The SQL-expression implementations exist so the driver's DuckDB oracle can
reproduce every value; they cost ~400us/doc in Spark whole-stage codegen.
These mapInArrow twins compute the SAME values (asserted element-exact in
tests/test_fast_text.py) at ~20-50x the throughput — the path a 10^9-document
dedup run actually takes, with the SQL path as its oracle.

Everything is whole-array numpy over Arrow buffers: UTF-8 first/last
codepoints are decoded vectorized from the byte stream (no per-word Python),
shingles/minhashes are strided int64 arithmetic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from xml2arrow_spark.pipeline import sqlgen as G

__all__ = ["minhash_batch", "simhash_batch", "word_tokens_batch"]

_VOCAB = 50257


def _codepoint_at(data: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Vectorized UTF-8 decode of the codepoint STARTING at byte offset
    ``starts`` (int64 array). Caller guarantees each start is a valid UTF-8
    leading byte. Returns int64 codepoints; empty slots must be filtered by
    the caller."""
    b0 = data[starts].astype(np.int64)
    out = b0.copy()
    two = (b0 >= 0xC0) & (b0 < 0xE0)
    three = (b0 >= 0xE0) & (b0 < 0xF0)
    four = b0 >= 0xF0
    if two.any():
        s = starts[two]
        out[two] = ((b0[two] & 0x1F) << 6) | (data[s + 1] & 0x3F)
    if three.any():
        s = starts[three]
        out[three] = (
            ((b0[three] & 0x0F) << 12)
            | ((data[s + 1].astype(np.int64) & 0x3F) << 6)
            | (data[s + 2] & 0x3F)
        )
    if four.any():
        s = starts[four]
        out[four] = (
            ((b0[four] & 0x07) << 18)
            | ((data[s + 1].astype(np.int64) & 0x3F) << 12)
            | ((data[s + 2].astype(np.int64) & 0x3F) << 6)
            | (data[s + 3] & 0x3F)
        )
    return out


def _last_char_starts(data: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Byte offset of the LAST character of each [start, end) utf-8 slice
    (slices must be non-empty). Walk back over continuation bytes (<=3)."""
    pos = ends - 1
    for _ in range(3):
        cont = (data[pos] & 0xC0) == 0x80
        pos = np.where(cont, pos - 1, pos)
    return np.maximum(pos, starts)


def word_tokens_batch(words: pa.ListArray) -> tuple[np.ndarray, np.ndarray]:
    """(flat token values int64, list offsets) for a list<string> of words.

    token(w) = (char_len(w)*7919 + cp_first(w)*31 + cp_last(w)*7) % VOCAB —
    exactly sqlgen.word_token (ascii('') = 0 in both engines).
    """
    import pyarrow.compute as pc

    list_offsets = np.asarray(words.offsets, dtype=np.int64)
    flat = words.flatten()
    so = np.frombuffer(flat.buffers()[1], dtype=np.int32)[
        flat.offset : flat.offset + len(flat) + 1
    ].astype(np.int64)
    data = np.frombuffer(flat.buffers()[2], dtype=np.uint8)
    starts, ends = so[:-1], so[1:]
    nonempty = ends > starts
    # char length via Arrow's C++ kernel (a numpy cumsum over the whole byte
    # stream costs more than everything else in this function combined)
    char_len = np.asarray(pc.utf8_length(flat)).astype(np.int64)
    cp_first = np.zeros(starts.size, dtype=np.int64)
    cp_last = np.zeros(starts.size, dtype=np.int64)
    if nonempty.any():
        s_ne, e_ne = starts[nonempty], ends[nonempty]
        cp_first[nonempty] = _codepoint_at(data, s_ne)
        cp_last[nonempty] = _codepoint_at(data, _last_char_starts(data, s_ne, e_ne))
    toks = (char_len * 7919 + cp_first * 31 + cp_last * 7) % _VOCAB
    return toks, list_offsets


def _distinct_shingles(toks: np.ndarray, offsets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-row DISTINCT word-trigram shingle hashes.

    shingle_i = ((t_i*31 + t_{i+1})*31 + t_{i+2}) % (2^31-1), i over each
    row's tokens; rows with < 3 tokens yield an empty set (sqlgen guard).
    Returns (flat distinct shingles, row offsets).
    """
    n_rows = offsets.size - 1
    lens = np.diff(offsets)
    sh_lens = np.maximum(lens - 2, 0)
    sh_offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(sh_lens, out=sh_offsets[1:])
    total = int(sh_offsets[-1])
    if total == 0:
        return np.zeros(0, dtype=np.int64), sh_offsets
    # global index of each shingle's first token: row_start + local_i
    row_ids = np.repeat(np.arange(n_rows), sh_lens)
    local = np.arange(total) - sh_offsets[row_ids]
    base = offsets[:-1][row_ids] + local
    sh = ((toks[base] * 31 + toks[base + 1]) * 31 + toks[base + 2]) % G.SHINGLE_MOD
    # distinct within row via ONE sort of a combined (row, value) key:
    # sh < 2^31, so key = row*2^31 + sh is collision-free in int64 and a
    # single np.sort beats lexsort's two keyed passes ~2x.
    key = (row_ids.astype(np.int64) << 31) | sh
    key.sort()
    keep = np.concatenate(([True], key[1:] != key[:-1]))
    k_k = key[keep]
    r_k = (k_k >> 31).astype(np.int64)
    v_k = k_k & ((1 << 31) - 1)
    d_lens = np.bincount(r_k, minlength=n_rows)
    d_offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(d_lens, out=d_offsets[1:])
    return v_k, d_offsets


def _segment_min(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-segment minimum over CONTIGUOUS segments (values grouped in
    offsets order, as :func:`_distinct_shingles` guarantees); empty segments
    -> -1 sentinel (caller masks). ``reduceat`` is ~5x ``ufunc.at`` here."""
    lens = np.diff(offsets)
    out = np.full(offsets.size - 1, -1, dtype=np.int64)
    ne = lens > 0
    if values.size:
        starts = offsets[:-1][ne]
        out[ne] = np.minimum.reduceat(values, starts)
    return out


def minhash_batch(texts: pa.Array) -> dict[str, pa.Array]:
    """sig (list<int64>, K values, null elements for shingle-less docs) and
    band0..band{B-1} (int64, null for shingle-less docs) per input text.
    Exact twin of sqlgen.minhash_expr/band_expr over dedup's shingle set."""
    texts = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    n = len(texts)
    null_mask = np.zeros(n, dtype=bool)
    if texts.null_count:
        null_mask = ~np.asarray(texts.is_valid())
        texts = texts.fill_null("")
    import pyarrow.compute as pc

    words = pc.split_pattern(texts.cast(pa.large_string()), " ")
    words = words.cast(pa.list_(pa.string()))
    toks, t_offsets = word_tokens_batch(words)
    sh, s_offsets = _distinct_shingles(toks, t_offsets)
    K = G.MINHASH_K
    sigs = np.empty((n, K), dtype=np.int64)
    for i in range(K):
        a, b = 2 * i + 3, 7 * i + 1
        sigs[:, i] = _segment_min((a * sh + b) % 1_000_003, s_offsets)
    has = np.diff(s_offsets) > 0
    has &= ~null_mask
    # sig list array: null ELEMENTS for shingle-less rows (array(min(empty))
    # in SQL is an array of NULLs, not a null array)
    elem_valid = np.repeat(has, K)
    sig_values = pa.array(
        sigs.reshape(-1), type=pa.int64(), mask=~elem_valid
    )
    sig_arr = pa.ListArray.from_arrays(
        pa.array(np.arange(n + 1, dtype=np.int32) * K, type=pa.int32()), sig_values
    )
    out: dict[str, pa.Array] = {"sig": sig_arr}
    R = G.MINHASH_ROWS
    for b_i in range(G.MINHASH_BANDS):
        band = sigs[:, b_i * R].copy()
        for r in range(1, R):
            band = band * 31 + sigs[:, b_i * R + r]
        out[f"band{b_i}"] = pa.array(band, type=pa.int64(), mask=~has)
    return out


def simhash_batch(texts: pa.Array) -> pa.Array:
    """32-bit SimHash per text — exact twin of sqlgen.simhash_expr over
    word tokens (ALL tokens, duplicates included, matching the SQL path).

    Null text -> 0, matching SQL: each bit's ``CASE WHEN sum(...) >= 0``
    evaluates NULL -> ELSE 0, and the 32 zeros sum to 0."""
    texts = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    n = len(texts)
    null_rows = np.zeros(n, dtype=bool)
    if texts.null_count:
        null_rows = ~np.asarray(texts.is_valid())
        texts = texts.fill_null("")
    import pyarrow.compute as pc

    words = pc.split_pattern(texts.cast(pa.large_string()), " ")
    words = words.cast(pa.list_(pa.string()))
    toks, offsets = word_tokens_batch(words)
    h = (toks * 2654435761) % 4294967296
    lens = np.diff(offsets)
    starts = offsets[:-1][lens > 0]
    out = np.zeros(n, dtype=np.int64)
    for j in range(G.SIMHASH_BITS):
        contrib = 2 * ((h >> j) & 1) - 1
        sums = np.zeros(n, dtype=np.int64)
        if contrib.size:
            sums[lens > 0] = np.add.reduceat(contrib, starts)
        out |= np.where(sums >= 0, np.int64(1) << j, 0)
    out[null_rows] = 0
    return pa.array(out, type=pa.int64())
