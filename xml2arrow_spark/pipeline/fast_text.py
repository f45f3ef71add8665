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


def minhash_batch(texts: pa.Array, with_dtoks: bool = False) -> dict[str, pa.Array]:
    """sig (list<int64>, K values, null elements for shingle-less docs) and
    band0..band{B-1} (int64, null for shingle-less docs) per input text.
    Exact twin of sqlgen.minhash_expr/band_expr over dedup's shingle set.

    ``with_dtoks=True`` additionally returns ``dtoks`` — each row's
    DISTINCT shingle set as list<int64> (SORTED order, not the SQL twin's
    first-occurrence order: every consumer is set-valued — sizes and
    intersect sizes — so element order is not part of any contract)."""
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
    if with_dtoks:
        out["dtoks"] = pa.ListArray.from_arrays(
            pa.array(s_offsets, type=pa.int64()).cast(pa.int32()),
            pa.array(sh, type=pa.int64()),
        )
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


# -- token-span dedup / chunking kernels (round 6) ---------------------------
# Vectorized twins of sqlgen.span_keys_expr / span_kept_expr+afold and
# textstats.chunk_sequences' slice+fold — the same fast-path discipline as
# minhash_batch (SQL is the oracle spec; numpy is the runtime path; exact
# equality pinned in tests/test_token_span_dedup.py, test_chunk_sequences.py,
# test_curation_randomized.py and test_fast_text.py).
#
# Arithmetic notes (exactness contract):
# - Every ``%`` in the SQL specs is the engines' TRUNCATED remainder; numpy's
#   ``%`` is floored. ``np.fmod`` is the truncated one — used wherever an
#   intermediate can be negative, so keys match Spark/DuckDB bit-for-bit for
#   ANY int32 tokens (the pinned negative-token contract).
# - The rolling fold (acc*31 + x) % M over NONNEGATIVE tokens equals
#   sum(x_i * 31^(m-1-i) mod M) mod M with canonical (nonnegative)
#   representatives — vectorizable via one reduceat. Rows containing a
#   negative token take a stepwise scalar fold instead (the representative
#   chain then depends on intermediate signs), keeping bit-exactness
#   universally; engine token streams are nonnegative by construction.

_FP_MOD = 2147483647  # textstats.FINGERPRINT_MOD


def list_column_views(arr) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(flat int64 child values, int64 offsets, bool validity) for a
    list<int> column of a record batch. ``offsets[i]:offsets[i+1]`` indexes
    the CHILD array (slice offset already applied by pyarrow's ``offsets``);
    null rows keep their (garbage) ranges — callers mask with validity."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offs = np.asarray(arr.offsets, dtype=np.int64)
    vals = np.asarray(arr.values, dtype=np.int64)
    if offs.size and offs[0] != 0:
        # sliced parent: rebase so row i is vals[offs[i]:offs[i+1]] with
        # offs[0] == 0 (every kernel below assumes the rebased form)
        vals = vals[offs[0]: offs[-1]]
        offs = offs - offs[0]
    if arr.null_count:
        valid = np.asarray(arr.is_valid())
    else:
        valid = np.ones(len(arr), dtype=bool)
    return vals, offs, valid


def span_keys_flat(
    toks: np.ndarray, offsets: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Packed double-hash window keys of every k-window per row — exact
    twin of sqlgen.span_keys_expr (truncated-mod steps, any-sign tokens).
    Returns (flat keys int64, per-row window offsets)."""
    lens = np.diff(offsets)
    wl = np.maximum(lens - (k - 1), 0)
    n = lens.size
    w_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(wl, out=w_off[1:])
    total = int(w_off[-1])
    if total == 0:
        return np.zeros(0, dtype=np.int64), w_off
    row_ids = np.repeat(np.arange(n), wl)
    base = offsets[:-1][row_ids] + (np.arange(total, dtype=np.int64) - w_off[row_ids])
    t0 = toks[base]
    h1 = np.fmod(t0, G.SPAN_MOD1)
    h2 = np.fmod(t0, G.SPAN_MOD2)
    for j in range(1, int(k)):
        tj = toks[base + j]
        h1 = np.fmod(h1 * G.SPAN_BASE1 + tj, G.SPAN_MOD1)
        h2 = np.fmod(h2 * G.SPAN_BASE2 + tj, G.SPAN_MOD2)
    return h1 * G.SPAN_MOD2 + h2, w_off


def fold31_segments(
    vals: np.ndarray, offsets: np.ndarray, mod: int = _FP_MOD
) -> np.ndarray:
    """Per-segment rolling fold ``acc = (acc*31 + x) % mod`` (init 0) over
    contiguous segments — exact twin of sqlgen.afold's fingerprint fold.
    Empty segments -> 0 (the fold's init)."""
    lens = np.diff(offsets)
    n = lens.size
    out = np.zeros(n, dtype=np.int64)
    if vals.size == 0 or n == 0:
        return out
    row_ids = np.repeat(np.arange(n), lens)
    local = np.arange(vals.size, dtype=np.int64) - offsets[:-1][row_ids]
    exp = lens[row_ids] - 1 - local
    maxlen = int(lens.max())
    pows = np.empty(maxlen, dtype=np.int64)
    p = 1
    for e in range(maxlen):
        pows[e] = p
        p = (p * 31) % mod
    terms = ((vals % mod) * pows[exp]) % mod
    ne = lens > 0
    starts = offsets[:-1][ne]
    sums = np.add.reduceat(terms, starts)
    out[ne] = sums % mod
    if vals.min() < 0:
        # stepwise truncated-mod fold for the (engine-contract-violating)
        # rows that contain negative tokens — bit-exact vs Spark/DuckDB %
        neg_rows = np.zeros(n, dtype=bool)
        neg_rows[ne] = np.minimum.reduceat(vals, starts) < 0
        for r in np.nonzero(neg_rows)[0]:
            acc = 0
            for x in vals[offsets[r]: offsets[r + 1]].tolist():
                v = acc * 31 + int(x)
                acc = v - int(v / mod) * mod  # truncated remainder
            out[r] = acc
    return out


def span_partial_counts(
    toks: np.ndarray, offsets: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Pass 1 of the span dedup: per-batch partial document frequencies —
    (distinct window keys, number of distinct in-batch docs per key). Each
    doc is one row, so per-batch partials SUM to the global distinct-doc
    count per key."""
    keys, w_off = span_keys_flat(toks, offsets, k)
    if keys.size == 0:
        return keys, np.zeros(0, dtype=np.int64)
    row_ids = np.repeat(np.arange(w_off.size - 1), np.diff(w_off))
    order = np.lexsort((keys, row_ids))
    rk, kk = row_ids[order], keys[order]
    keep = np.concatenate(([True], (rk[1:] != rk[:-1]) | (kk[1:] != kk[:-1])))
    uk, counts = np.unique(kk[keep], return_counts=True)
    return uk, counts.astype(np.int64)


def span_clean_segments(
    toks: np.ndarray, offsets: np.ndarray, k: int, frequent_sorted: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pass 2 of the span dedup: per row (n_frequent_spans, n_kept,
    kept_fp) — exact twin of the span_kept_expr + fold pipeline given the
    SORTED frequent-key array."""
    n = offsets.size - 1
    keys, w_off = span_keys_flat(toks, offsets, k)
    wl = np.diff(w_off)
    row_ids = np.repeat(np.arange(n), wl)
    local = np.arange(keys.size, dtype=np.int64) - w_off[row_ids]
    if frequent_sorted.size and keys.size:
        idx = np.searchsorted(frequent_sorted, keys)
        idx_c = np.minimum(idx, frequent_sorted.size - 1)
        isfreq = frequent_sorted[idx_c] == keys
    else:
        isfreq = np.zeros(keys.size, dtype=bool)
    n_freq = np.bincount(row_ids[isfreq], minlength=n).astype(np.int64)
    total_toks = int(offsets[-1]) if offsets.size else 0
    tok_lens = np.diff(offsets)
    tok_rows = np.repeat(np.arange(n), tok_lens)
    if isfreq.any():
        cov = np.zeros(total_toks + int(k) + 1, dtype=np.int64)
        fs_global = offsets[:-1][row_ids[isfreq]] + local[isfreq]
        np.add.at(cov, fs_global, 1)
        np.add.at(cov, fs_global + int(k), -1)
        kept_mask = np.cumsum(cov[:total_toks]) == 0
        kept_vals = toks[:total_toks][kept_mask]
        n_kept = np.bincount(tok_rows[kept_mask], minlength=n).astype(np.int64)
    else:
        kept_vals = toks[:total_toks]
        n_kept = tok_lens.astype(np.int64)
    k_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_kept, out=k_off[1:])
    fp = fold31_segments(kept_vals, k_off)
    return n_freq, n_kept, fp


def chunk_segments(
    toks: np.ndarray, offsets: np.ndarray, L: int, st: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Context-length chunking — exact twin of textstats.chunk_sequences'
    explode+slice+fold. Returns flat (row_ids, chunk_id, chunk_start,
    chunk_len, chunk_fp); rows with no tokens yield no chunks."""
    lens = np.diff(offsets)
    n = lens.size
    n_chunks = np.where(
        lens > 0, 1 + np.maximum(0, lens - L + st - 1) // st, 0
    ).astype(np.int64)
    c_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_chunks, out=c_off[1:])
    total = int(c_off[-1])
    if total == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z, z, z
    row_ids = np.repeat(np.arange(n), n_chunks)
    chunk_id = np.arange(total, dtype=np.int64) - c_off[row_ids]
    chunk_start = chunk_id * st
    chunk_len = np.minimum(L, lens[row_ids] - chunk_start)
    f_off = np.zeros(total + 1, dtype=np.int64)
    np.cumsum(chunk_len, out=f_off[1:])
    flat = int(f_off[-1])
    chunk_of = np.repeat(np.arange(total), chunk_len)
    local = np.arange(flat, dtype=np.int64) - f_off[chunk_of]
    gidx = offsets[:-1][row_ids[chunk_of]] + chunk_start[chunk_of] + local
    fp = fold31_segments(toks[gidx], f_off)
    return row_ids, chunk_id, chunk_start, chunk_len, fp


def null_rows_emptied(
    vals: np.ndarray, offs: np.ndarray, valid: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Rewrite (vals, offs) so every null row's range is EMPTY (null list
    entries may point at garbage child ranges; kernels must never read
    them)."""
    lens = np.diff(offs) * valid
    new_off = np.zeros(offs.size, dtype=np.int64)
    np.cumsum(lens, out=new_off[1:])
    keep = np.repeat(valid, np.diff(offs))
    return vals[keep], new_off


def paragraph_views(
    texts: pa.Array, pw: int
) -> tuple[pa.Array, np.ndarray, np.ndarray, pa.Array]:
    """Per-text runs of ``pw`` consecutive whitespace words, byte-SLICED
    out of the original text buffer (split-on-' '/join-' ' is an exact
    round trip, so each "paragraph" is a contiguous byte range of its
    text — the Arrow re-slice trick: new offsets over the same data, no
    per-row python). Exact twin of textstats.paragraph_dedup's
    ``array_join(slice(split(text,' '), i*pw+1, pw), ' ')`` segments.

    ``texts`` must be null-free (callers filter; SQL drops null-text docs
    from the output entirely). Returns (paras StringArray, row id per
    para, words-per-para, words ListArray — for the token fold)."""
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_rows = len(texts)
    words = pc.split_pattern(texts.cast(pa.large_string()), " ")
    words = words.cast(pa.list_(pa.string()))
    w_offs = np.asarray(words.offsets, dtype=np.int64)
    flat = words.flatten()
    so = np.frombuffer(flat.buffers()[1], dtype=np.int32)[
        flat.offset: flat.offset + len(flat) + 1
    ].astype(np.int64)
    wbytes = np.diff(so)
    wcount = np.diff(w_offs)
    # word start byte offset WITHIN its row's text: running (len+1) within
    # the row, via one global cumsum minus the row base
    step = wbytes + 1
    g = np.cumsum(step) - step
    rows_of_word = np.repeat(np.arange(n_rows), wcount)
    base = np.zeros(wbytes.size, dtype=np.int64)
    if wbytes.size:
        base = g[w_offs[:-1][rows_of_word]]
    wstart = g - base
    # paragraph geometry: ceil(wcount/pw) segments per row (>=1 — split
    # of any non-null string yields at least one word)
    n_seg = -(-wcount // pw)
    p_off = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(n_seg, out=p_off[1:])
    total_p = int(p_off[-1])
    row_of_para = np.repeat(np.arange(n_rows), n_seg)
    local_p = np.arange(total_p, dtype=np.int64) - p_off[row_of_para]
    first_w = w_offs[:-1][row_of_para] + local_p * pw
    last_w = (
        w_offs[:-1][row_of_para]
        + np.minimum(local_p * pw + pw, wcount[row_of_para])
        - 1
    )
    pstart = wstart[first_w]
    pend = wstart[last_w] + wbytes[last_w]
    plen = pend - pstart
    # gather the para bytes from the ORIGINAL text buffer
    t_so = np.frombuffer(texts.buffers()[1], dtype=np.int32)[
        texts.offset: texts.offset + n_rows + 1
    ].astype(np.int64)
    t_data = np.frombuffer(texts.buffers()[2], dtype=np.uint8)
    out_off = np.zeros(total_p + 1, dtype=np.int64)
    np.cumsum(plen, out=out_off[1:])
    total_b = int(out_off[-1])
    para_of_byte = np.repeat(np.arange(total_p), plen)
    local_b = np.arange(total_b, dtype=np.int64) - out_off[para_of_byte]
    gsrc = t_so[:-1][row_of_para[para_of_byte]] + pstart[para_of_byte] + local_b
    out = t_data[gsrc]
    paras = pa.StringArray.from_buffers(
        total_p,
        pa.py_buffer(out_off.astype(np.int32).tobytes()),
        pa.py_buffer(out.tobytes()),
    )
    wpp = last_w - first_w + 1
    return paras, row_of_para, wpp, words
