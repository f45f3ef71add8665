"""Unit-local row clustering for the fused dataset encode.

Lexicographic presort clusters zone maps on the LEADING column only: a
predicate on the second sort column scans every block. Z-ordering
interleaves the columns' rank bits into one Morton code, so each block's
rows sit in a small hyper-rectangle of the value space and zone maps
prune on EVERY clustered column at once (linearized multi-dimensional
clustering — Morton, "A computer oriented geodetic data base", IBM 1966;
the move behind Delta/Iceberg Z-ORDER table maintenance).

Everything here is UNIT-LOCAL (one input file = one work unit = one
task): ranks are computed per unit with a vectorized argsort, no shuffle,
no global statistics — the same no-coordination contract as the rest of
the fused encode path. Clustering is physical only: decode order changes,
decoded VALUES never do (the engine's per-row-equality contract).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

ZBITS = 16  # rank bucket width per column; 4 columns fill a uint64


def _bucket_ranks(col: pa.ChunkedArray | pa.Array, n: int) -> np.ndarray:
    """Equi-depth bucket codes (0 .. 2^ZBITS-1) for one column: rank every
    row with one argsort (nulls first, so they cluster in the lowest
    blocks — matching zone-map semantics, where a null carries no bound)
    and scale ranks to the bucket width. Equi-depth beats equi-width here:
    skewed columns still spread over the full code range, so the
    interleave keeps discriminating."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    idx = pc.sort_indices(col, null_placement="at_start")
    ranks = np.empty(n, dtype=np.int64)
    ranks[idx.to_numpy(zero_copy_only=False)] = np.arange(n, dtype=np.int64)
    if n > 1:
        ranks = ranks * ((1 << ZBITS) - 1) // (n - 1)
    return ranks.astype(np.uint64)


def zorder_indices(tbl: pa.Table, columns: list[str]) -> np.ndarray:
    """Row permutation that sorts ``tbl`` by the Morton interleave of the
    ``columns``' equi-depth rank buckets. 1 column degenerates to a plain
    (rank) sort; up to 4 columns fit the uint64 code."""
    if not (1 <= len(columns) <= 4):
        raise ValueError(
            f"zorder clusters 1-4 columns, got {len(columns)} "
            f"({columns!r}): more interleaved dimensions than that stop "
            "discriminating at 16 bits each"
        )
    n = tbl.num_rows
    if n == 0:
        return np.empty(0, dtype=np.int64)
    codes = [_bucket_ranks(tbl.column(c), n) for c in columns]
    m = len(codes)
    if m == 1:
        z = codes[0]
    else:
        z = np.zeros(n, dtype=np.uint64)
        for b in range(ZBITS):
            for i, code in enumerate(codes):
                z |= ((code >> np.uint64(b)) & np.uint64(1)) << np.uint64(
                    b * m + (m - 1 - i)
                )
    # stable: equal codes keep input order, so the permutation (and every
    # downstream block boundary and zone map) is deterministic
    return np.argsort(z, kind="stable")


def presort_table(tbl: pa.Table, columns: list[str], cluster: str) -> pa.Table:
    """Reorder one unit's rows for encoding: ``cluster='lex'`` sorts
    lexicographically (nulls first, the leading-column clustering),
    ``cluster='zorder'`` applies :func:`zorder_indices`."""
    if not columns:
        return tbl
    if cluster == "lex":
        return tbl.sort_by(
            [(c, "ascending") for c in columns], null_placement="at_start"
        )
    if cluster == "zorder":
        return tbl.take(pa.array(zorder_indices(tbl, columns)))
    raise ValueError(f"unknown cluster {cluster!r}: use 'lex' or 'zorder'")
