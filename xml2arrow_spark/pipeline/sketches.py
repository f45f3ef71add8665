"""Cardinality sketches: KMV (k-minimum-values) distinct-count estimation.

The stats surface a 10^12-row engine plans with: exact ``COUNT(DISTINCT)``
over a wide table is a full shuffle of every distinct value; the KMV sketch
(Bar-Yossef et al., "Counting Distinct Elements in a Data Stream", RANDOM
2002) shuffles only hash VALUES and keeps k of them per group — error
~1/sqrt(k) (k=256 → ~6%). Chosen over HyperLogLog (Spark's
``approx_count_distinct``) deliberately: KMV is pure integer arithmetic
over a portable hash (`sqlgen.kmv_hash_expr`), so DuckDB reproduces the
ESTIMATE bit-for-bit and the driver gate can pin it — an HLL estimate is
engine-private. Below k distinct values the sketch is exact by
construction.

Scale shape: one (group, hash) dedup shuffle + one k-bounded window per
group — both distributed, no ``collect_set`` (unbounded executor memory),
no driver-side state. Reference analog: the per-table row/byte bookkeeping
the reference finalizes per RecordBatch (/root/reference/src/
xml_parser.rs:491-511), widened to a planning statistic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from xml2arrow_spark.pipeline import sqlgen as G

__all__ = ["kmv_distinct", "kmv_token_vocab", "group_distinct_est",
           "group_distinct", "kmv_hash_np", "KMV_K"]

KMV_K = 256


def _kmv_agg(pairs: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """(group, h) pairs -> one row per group with ``n_distinct_est``.

    ``pairs`` must already be distinct per (group, h); h values are distinct
    within a group, so the row_number order is total and deterministic."""
    w = Window.partitionBy(*group_cols).orderBy("h")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= int(k))
        .groupBy(*group_cols)
        .agg(F.count("*").alias("n_h"), F.max("h").alias("h_k"))
        .select(
            *group_cols,
            F.expr(G.kmv_estimate_expr("n_h", "h_k", k, "spark")).alias(
                "n_distinct_est"
            ),
        )
    )


def kmv_distinct(df: DataFrame, cols: list[str], k: int = KMV_K) -> DataFrame:
    """Distinct-count estimate per column, ALL columns in one pass.

    Returns one row per column: ``(column, n_distinct_est)``. Columns are
    stacked into (column, h) pairs before the dedup, so adding columns adds
    map-side work, not jobs. Nulls are excluded (the SQL COUNT(DISTINCT)
    convention). Integer-typed columns only — the portable hash is integer
    arithmetic; hash string columns through a fingerprint fold first."""
    pairs = (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("column"),
                            F.expr(G.kmv_hash_expr(c, "spark")).alias("h"),
                        )
                        for c in cols
                    ]
                )
            ).alias("p")
        )
        .select("p.column", "p.h")
        .filter(F.col("h").isNotNull())
        .distinct()
    )
    return _kmv_agg(pairs, ["column"], k)


def kmv_token_vocab(tok: DataFrame, k: int = KMV_K) -> DataFrame:
    """Per-source vocabulary-size estimate over the token table: one row
    per source, ``n_vocab_est`` = KMV estimate of distinct token ids. The
    explode never leaves the map side — dedup happens on 8-byte
    (source, h) pairs, not token payloads."""
    pairs = (
        tok.select("source", F.explode("tokens").alias("t"))
        .select("source", F.expr(G.kmv_hash_expr("t", "spark")).alias("h"))
        .distinct()
    )
    return _kmv_agg(pairs, ["source"], k)


def kmv_hash_np(v):
    """Numpy twin of :func:`sqlgen.kmv_hash_expr` — bit-identical for every
    int64 input (pinned in tests/test_sketches_dataset.py): nonnegative
    residue mod M (numpy's floor ``%`` with a positive modulus EQUALS the
    SQL double-``%`` nonneg fold, including for negative inputs), then two
    quadratic rounds. Every intermediate stays < 2^63 (r < 2^31, so
    r*r < 2^62 and the additive terms add ~2^47)."""
    import numpy as np

    M = G.KMV_MOD
    A = G.KMV_MULT
    r = v.astype(np.int64) % M
    r = (r * r % M + r * A + 11) % M
    return (r * r % M + r * A) % M


def _block_group_keys(key_pairs):
    """One block's ``(keys, codes)`` for a (possibly COMPOSITE) group key:
    a single key column rides :func:`~xml2arrow_spark.operators.blocks
    .group_codes_column` (dictionary slots + the NULL slot), several ride
    :func:`~xml2arrow_spark.operators.blocks.composite_group_codes`
    (compacted mixed-radix codes; ``keys[j]`` is then a tuple with None
    components for NULLs)."""
    from xml2arrow_spark.operators.blocks import (
        composite_group_codes,
        group_codes_column,
    )

    if len(key_pairs) == 1:
        dictionary, codes = group_codes_column(*key_pairs[0])
        return dictionary.to_pylist() + [None], codes
    return composite_group_codes(key_pairs)


def _normalize_key_cols(key, by_name, caller):
    """str|list key -> validated list of scalar-typed key columns."""
    key_cols = [key] if isinstance(key, str) else list(key)
    if not key_cols:
        raise ValueError(f"{caller} needs at least one key column")
    for kc in key_cols:
        if kc not in by_name:
            raise ValueError(
                f"dataset lacks encoded column {kc!r}; it has {sorted(by_name)}"
            )
        kt = by_name[kc].split(None, 1)[1].lower()
        if "float" in kt or "double" in kt or "array" in kt:
            raise ValueError(
                f"{caller} needs scalar int/string/bool/decimal key(s), "
                f"got {kc} {kt}"
            )
    return key_cols


def _kmv_merge(acc: list, hashes, k: int) -> list:
    """Merge sorted distinct hash lists, keep the k smallest distinct."""
    if not acc:
        return list(hashes[: int(k)])
    import heapq

    out = []
    last = None
    for h in heapq.merge(acc, hashes):
        if h != last:
            out.append(h)
            last = h
            if len(out) >= k:
                break
    return out


def group_distinct_est(
    spark,
    out_path: str,
    key: str,
    column: str,
    k: int = KMV_K,
    n_tasks: int | None = None,
    local_bytes: int = 128 << 20,
    where=None,
):
    """Per-group distinct-count ESTIMATE over a STORED dataset, computed on
    the codec streams — ``SELECT key, approx(COUNT(DISTINCT column))
    [WHERE ...] GROUP BY key`` with a gate-pinnable answer: the key's
    group codes ride :func:`~xml2arrow_spark.operators.blocks
    .group_codes_column` (dict/rle/dict_str — key values never materialize
    per row), the value column decodes once per block and hashes through
    the PORTABLE quadratic hash (:func:`kmv_hash_np` ==
    ``sqlgen.kmv_hash_expr`` bit-for-bit), and each block keeps only the k
    smallest distinct hashes PER GROUP — so a 10^12-row corpus ships
    (groups x k) 8-byte partials per file, never values. Error ~1/sqrt(k)
    (k=256 → ~6%); EXACT below k distinct values per group, and exact in
    the oracle's eyes always — DuckDB reproduces the estimate bit-for-bit,
    which an HLL (Spark's approx_count_distinct) cannot offer.

    Integer value columns only (the portable hash is integer arithmetic);
    NULL values never count (SQL COUNT(DISTINCT)); the NULL key is its own
    group; ``key`` may be a LIST of columns — a COMPOSITE key combined on
    the mixed-radix code stream (every NULL combination its own group).
    ``where`` takes count_where's range/IN-list conjunctions: zone-
    pruned blocks skip unread, provably-inside blocks hash unmasked, and
    straddling blocks mask first — there is no metadata claim (distinct
    hashes need the values), so interior just means "no mask".

    Scale-adaptive dispatch like the exact aggregates; the distributed
    roll-up is one KB-scale (key, hash) shuffle + per-key window, no
    collect_set. Returns ``(key, n_distinct_est bigint)``.
    """
    import os

    import numpy as np
    import pyarrow as pa
    import yaml

    from xml2arrow_spark.operators.blocks import decode_column
    from xml2arrow_spark.operators.dataset import (
        _CW_INT_TYPES,
        _refuse_pending_tombstones,
        _resolve_conjuncts,
        MANIFEST_SIDECAR,
    )
    from xml2arrow_spark.operators.encode import split_schema_ddl
    from xml2arrow_spark.sources.files import (
        parquet_file_infos,
        plan_parquet_tasks,
    )

    if k < 1:
        raise ValueError(f"group_distinct_est needs k >= 1, got {k}")
    # block stats cannot see row-level soft deletes: counting tombstoned
    # rows would silently misreport (the same contract every metadata-
    # accelerated aggregate in operators/dataset.py enforces)
    _refuse_pending_tombstones(out_path)
    with open(os.path.join(out_path, MANIFEST_SIDECAR)) as f:
        side = yaml.safe_load(f.read())
    by_name = split_schema_ddl(side["schema_ddl"])
    if column not in by_name:
        raise ValueError(
            f"dataset lacks encoded column {column!r}; it has {sorted(by_name)}"
        )
    key_cols = _normalize_key_cols(key, by_name, "group_distinct_est")
    val_type = by_name[column].split(None, 1)[1].strip().lower()
    if val_type not in _CW_INT_TYPES:
        raise ValueError(
            f"group_distinct_est needs an integer value column, got "
            f"{column} {val_type}: the portable KMV hash is integer "
            f"arithmetic (fingerprint strings first)"
        )
    wide = side.get("layout", "nested") == "wide"
    conj = (
        _resolve_conjuncts(by_name, where, "group_distinct_est")
        if where is not None
        else None
    )

    def _block_hashes(tally, key_pairs, val_pair, mask):
        keys, codes = _block_group_keys(key_pairs)
        arr = decode_column(*val_pair)
        valid = np.asarray(arr.is_valid()) if arr.null_count else None
        if mask is not None:
            valid = mask if valid is None else (valid & mask)
        if valid is not None:
            v = arr.fill_null(0).to_numpy()[valid]
            gcodes = codes[valid]
        else:
            v = arr.to_numpy()
            gcodes = codes
        if not v.size:
            return
        h = kmv_hash_np(v)
        # distinct (code, hash), sorted — then the first k per code
        pairs = np.unique(np.stack([gcodes, h], axis=1), axis=0)
        starts = np.searchsorted(pairs[:, 0], np.arange(len(keys)))
        ends = np.searchsorted(pairs[:, 0], np.arange(1, len(keys) + 1))
        for g, kv in enumerate(keys):
            lo, hi = int(starts[g]), int(ends[g])
            if lo == hi:
                continue
            hs = pairs[lo:min(hi, lo + int(k)), 1].tolist()
            tally[kv] = _kmv_merge(tally.get(kv, []), hs, k)

    def _file_hashes(fpath, pq_mod):
        """One file's {key_or_None: sorted <=k smallest distinct hashes}."""
        return _fold_blocks_file(
            fpath, pq_mod, key_cols, column, conj, wide, _block_hashes
        )

    def _estimate(hashes: list) -> int:
        n_h = len(hashes)
        if n_h < k:
            return n_h
        return (int(k) - 1) * G.KMV_MOD // max(int(hashes[-1]), 1)

    infos = parquet_file_infos(os.path.join(out_path, "blocks"))
    if sum(s for _p, s in infos) <= local_bytes:
        from xml2arrow_spark.sources.files import map_local_files

        total: dict = {}
        for fh in map_local_files(infos, _file_hashes):
            for kv, hs in fh.items():
                total[kv] = _kmv_merge(total.get(kv, []), hs, k)
        items = list(total.items())
        # arrow-backed LocalRelation — the KB-metadata finish rule
        from pyspark.sql.pandas.types import to_arrow_schema
        from pyspark.sql.types import StructType

        key_ddl = ", ".join(by_name[kc] for kc in key_cols)
        lsch = to_arrow_schema(
            StructType.fromDDL(f"{key_ddl}, n_distinct_est bigint")
        )
        krows = [kv if isinstance(kv, tuple) else (kv,) for kv, _h in items]
        cols = {
            kc: pa.array([r[i] for r in krows], type=lsch.field(i).type)
            for i, kc in enumerate(key_cols)
        }
        cols["n_distinct_est"] = pa.array(
            [_estimate(hs) for _kv, hs in items], type=pa.int64()
        )
        return spark.createDataFrame(
            pa.table(cols), schema=f"{key_ddl}, n_distinct_est bigint"
        )

    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import StructType
    from typing import Iterator

    key_ddl = ", ".join(by_name[kc] for kc in key_cols)
    part_ddl = f"{key_ddl}, h bigint"
    out_schema = to_arrow_schema(StructType.fromDDL(part_ddl))

    def hash_files(batches: "Iterator[pa.RecordBatch]"):
        import pyarrow.parquet as pq

        from xml2arrow_spark.env import limit_arrow_threads

        limit_arrow_threads(1)
        for b in batches:
            path_lists = b.column(b.schema.get_field_index("path")).to_pylist()
            for fpath in (p for paths in path_lists for p in paths):
                tally = _file_hashes(fpath, pq)
                if not tally:
                    continue
                ks: list = [[] for _ in key_cols]
                hs: list = []
                for kv, hh in tally.items():
                    t = kv if isinstance(kv, tuple) else (kv,)
                    for i in range(len(key_cols)):
                        ks[i] += [t[i]] * len(hh)
                    hs += hh
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(ks[i], type=out_schema.field(i).type)
                        for i in range(len(key_cols))
                    ] + [pa.array(hs, type=pa.int64())],
                    names=list(key_cols) + ["h"],
                )

    tasks = plan_parquet_tasks(spark, os.path.join(out_path, "blocks"), n_tasks)
    pairs = tasks.mapInArrow(hash_files, part_ddl).distinct()
    return _kmv_agg(pairs, key_cols, k)


def _fold_blocks_file(fpath, pq_mod, key_cols, column, conj, wide, on_block):
    """Walk one blocks file, classify blocks against the (possibly DNF)
    ``conj`` via the shared zone classifier, and call
    ``on_block(tally, key_pairs, val_pair, mask)`` for every surviving
    block (``key_pairs`` = one (meta, payload) pair per key column — the
    COMPOSITE-key generalization). The block walk shared by the per-group
    distinct operators (:func:`group_distinct_est`,
    :func:`group_distinct`); returns the accumulated tally dict."""
    from xml2arrow_spark.operators.dataset import (
        _ZONE_SUFFIXES,
        _classify_where,
        _conj_boundary_mask,
    )

    tally: dict = {}
    if wide:
        avail = set(pq_mod.read_schema(fpath).names)
        fstat: list[tuple] = []
        if conj is not None:
            for col, _values, _lo, _hi, cat in conj:
                zmin, zmax = _ZONE_SUFFIXES[cat]
                fstat.append(tuple(
                    n if n in avail else None
                    for n in (f"c_{col}__{zmin}", f"c_{col}__{zmax}",
                              f"c_{col}__n_null")
                ))
        kinds = None
        if conj is not None:
            stat_cols = [n for trip in fstat for n in trip if n is not None]
            if stat_cols:
                st = pq_mod.read_table(fpath, columns=sorted(set(stat_cols)))
                n_blocks = st.num_rows
            else:
                st = None
                n_blocks = pq_mod.read_metadata(fpath).num_rows
            kinds = [
                _classify_where(conj, [
                    tuple(
                        st.column(n)[i].as_py()
                        if (st is not None and n is not None)
                        else None
                        for n in trip
                    )
                    for trip in fstat
                ])
                for i in range(n_blocks)
            ]
            if all(kd == "pruned" for kd in kinds):
                return tally
        cols = [
            x for k in key_cols for x in (f"c_{k}__meta", f"c_{k}__data")
        ] + [f"c_{column}__meta", f"c_{column}__data"]
        if conj is not None:
            cols += [
                x for col, _v, _l, _h, _c in conj
                for x in (f"c_{col}__meta", f"c_{col}__data")
            ]
        cols = list(dict.fromkeys(cols))
        pay = pq_mod.read_table(fpath, columns=cols)
        arrays = {c: pay.column(c).combine_chunks() for c in cols}
        for i in range(pay.num_rows):
            mask = None
            if kinds is not None:
                if kinds[i] == "pruned":
                    continue
                if kinds[i] == "boundary":
                    mask = _conj_boundary_mask(conj, lambda c, i=i: (
                        arrays[f"c_{c}__meta"][i].as_py(),
                        arrays[f"c_{c}__data"][i].as_py(),
                    ))
                    if mask is None:
                        continue
            on_block(
                tally,
                [
                    (arrays[f"c_{k}__meta"][i].as_py(),
                     arrays[f"c_{k}__data"][i].as_py())
                    for k in key_cols
                ],
                (arrays[f"c_{column}__meta"][i].as_py(),
                 arrays[f"c_{column}__data"][i].as_py()),
                mask,
            )
    else:
        tbl = pq_mod.read_table(fpath, columns=["cols"])
        cols_col = tbl.column("cols").combine_chunks()
        entry_fields = {
            f.name for f in tbl.schema.field("cols").type.value_type
        }
        for row in range(len(cols_col)):
            entries = cols_col[row].values
            names = entries.field("name").to_pylist()
            try:
                kis = [names.index(k) for k in key_cols]
                vi = names.index(column)
            except ValueError:
                raise ValueError(
                    f"block lacks an entry for {key_cols!r}/{column!r}; the "
                    f"sidecar schema and the blocks files disagree"
                ) from None
            mask = None
            if conj is not None:
                stats = []
                for col, _values, _lo, _hi, cat in conj:
                    zmin, zmax = _ZONE_SUFFIXES[cat]
                    try:
                        fi = names.index(col)
                    except ValueError:
                        raise ValueError(
                            f"block lacks an entry for {col!r}; the "
                            f"sidecar schema and the blocks files "
                            f"disagree"
                        ) from None
                    stats.append(tuple(
                        entries.field(f)[fi].as_py()
                        if f in entry_fields
                        else None
                        for f in (zmin, zmax, "n_null")
                    ))
                kind = _classify_where(conj, stats)
                if kind == "pruned":
                    continue
                if kind == "boundary":
                    mask = _conj_boundary_mask(conj, lambda c: (
                        entries.field("meta")[names.index(c)].as_py(),
                        entries.field("data")[names.index(c)].as_py(),
                    ))
                    if mask is None:
                        continue
            on_block(
                tally,
                [
                    (entries.field("meta")[ki].as_py(),
                     entries.field("data")[ki].as_py())
                    for ki in kis
                ],
                (entries.field("meta")[vi].as_py(),
                 entries.field("data")[vi].as_py()),
                mask,
            )
    return tally


def group_distinct(
    spark,
    out_path: str,
    key: str,
    column: str,
    n_tasks: int | None = None,
    local_bytes: int = 128 << 20,
    where=None,
    max_pairs: int = 8_000_000,
):
    """EXACT per-group ``COUNT(DISTINCT column)`` over a STORED dataset,
    computed on the codec streams — the exact twin of
    :func:`group_distinct_est`. Per block, the key's group codes ride
    :func:`~xml2arrow_spark.operators.blocks.group_codes_column`
    (dict/rle/dict_str — key values never materialize per row), the value
    column decodes once, and ONLY the block's distinct ``(group, value)``
    pairs survive (``np.unique`` — per-block dedup is the map-side
    combine). Exactness has an irreducible price the estimator does not
    pay: distinct pairs must MEET to dedup across blocks, so the
    distributed roll-up shuffles one row per per-file-distinct (key,
    value) pair — bounded by ``files x true_distinct``, not by corpus
    rows, and honest about it: ``max_pairs`` (default 8M) caps the
    per-file pair tally and REFUSES with a pointer at
    :func:`group_distinct_est` instead of silently OOMing a 10^12-row
    high-cardinality column. Use this for bounded-cardinality columns
    (vocab ids, categories, buckets); use the KMV estimate everywhere
    else.

    Integer AND string value columns (strings stay on the dict_str CODE
    stream — distinct (group, value-code) pairs first, the small distinct
    set maps through the dictionary after; the exact twin needs no
    portable hash, so the estimator's int-only restriction does not
    apply. Floats refuse: SQL DISTINCT treats NaNs as equal, IEEE does
    not). NULL values never count, and a group whose values are ALL
    NULL does not appear — both distinct operators group the non-null
    (key, value) pair stream, i.e. SQL's ``WHERE value IS NOT NULL``
    before the GROUP BY (the estimator's gate-pinned semantics); the
    NULL key is its own group, and ``key`` may be a LIST of columns (a
    COMPOSITE key on the mixed-radix code stream — 'distinct X per
    (source, day)'). ``where`` takes count_where's range /
    IN-list conjunctions or an ``any_of`` DNF: zone-pruned blocks skip
    unread, straddling blocks mask first. Scale-adaptive dispatch like
    the exact aggregates. Returns ``(key, n_distinct bigint)``.
    """
    import os

    import numpy as np
    import pyarrow as pa
    import yaml

    from xml2arrow_spark.operators.blocks import decode_column
    from xml2arrow_spark.operators.dataset import (
        _CW_INT_TYPES,
        _refuse_pending_tombstones,
        _resolve_conjuncts,
        MANIFEST_SIDECAR,
    )
    from xml2arrow_spark.operators.encode import split_schema_ddl
    from xml2arrow_spark.sources.files import (
        parquet_file_infos,
        plan_parquet_tasks,
    )

    if max_pairs < 1:
        raise ValueError(f"group_distinct needs max_pairs >= 1, got {max_pairs}")
    _refuse_pending_tombstones(out_path)
    with open(os.path.join(out_path, MANIFEST_SIDECAR)) as f:
        side = yaml.safe_load(f.read())
    by_name = split_schema_ddl(side["schema_ddl"])
    if column not in by_name:
        raise ValueError(
            f"dataset lacks encoded column {column!r}; it has {sorted(by_name)}"
        )
    key_cols = _normalize_key_cols(key, by_name, "group_distinct")
    val_type = by_name[column].split(None, 1)[1].strip().lower()
    val_is_str = val_type == "string"
    if not val_is_str and val_type not in _CW_INT_TYPES:
        raise ValueError(
            f"group_distinct needs an integer or string value column, got "
            f"{column} {val_type}: float DISTINCT is not portable (SQL "
            f"treats NaNs as equal, IEEE does not)"
        )
    wide = side.get("layout", "nested") == "wide"
    conj = (
        _resolve_conjuncts(by_name, where, "group_distinct")
        if where is not None
        else None
    )

    def _cap_check(tally):
        if sum(len(s) for s in tally.values()) > max_pairs:
            raise ValueError(
                f"group_distinct exceeded max_pairs={max_pairs} distinct "
                f"(key, value) pairs in one file's tally: exact distinct "
                f"counting must materialize every distinct pair — for "
                f"high-cardinality columns use group_distinct_est (KMV, "
                f"bounded at k hashes per group) or raise max_pairs"
            )

    def _block_pairs(tally, key_pairs, val_pair, mask):
        keys, codes = _block_group_keys(key_pairs)
        if val_is_str:
            # string values stay on the CODE stream (dict_str never
            # materializes per-row strings): distinct (group, value-code)
            # pairs first, the (small) distinct set maps through the
            # dictionary after. The dictionary MAY repeat a value (RLE
            # run values are not uniqued) — set semantics absorb that.
            from xml2arrow_spark.operators.blocks import group_codes_column

            vdict, vcodes = group_codes_column(*val_pair)
            vals_list = vdict.to_pylist()
            valid = vcodes != len(vals_list)  # drop the NULL slot
            if mask is not None:
                valid &= np.asarray(mask, dtype=bool)
            v = vcodes[valid]
        else:
            arr = decode_column(*val_pair)
            valid = np.asarray(arr.is_valid()) if arr.null_count else None
            if mask is not None:
                valid = mask if valid is None else (valid & mask)
            if valid is not None:
                v = arr.fill_null(0).to_numpy()[valid]
            else:
                v = arr.to_numpy()
        gcodes = codes[valid] if valid is not None else codes
        if not v.size:
            return
        # distinct (group, value) pairs via lexsort + run-boundary keep:
        # np.unique(axis=0) sorts a VOID view (~3x slower, measured 1.8 s
        # of the 2.2 s block walk at sf1.0 before r06)
        g_a = gcodes.astype(np.int64)
        v_a = v.astype(np.int64)
        order = np.lexsort((v_a, g_a))
        g_s, v_s = g_a[order], v_a[order]
        keep = np.concatenate(
            ([True], (g_s[1:] != g_s[:-1]) | (v_s[1:] != v_s[:-1]))
        )
        pg, pv = g_s[keep], v_s[keep]
        starts = np.searchsorted(pg, np.arange(len(keys)))
        ends = np.searchsorted(pg, np.arange(1, len(keys) + 1))
        for g, kv in enumerate(keys):
            lo, hi = int(starts[g]), int(ends[g])
            if lo == hi:
                continue
            vv = pv[lo:hi].tolist()
            if val_is_str:
                vv = [vals_list[c] for c in vv]
            tally.setdefault(kv, set()).update(vv)
        _cap_check(tally)

    def _file_pairs(fpath, pq_mod):
        """One file's {key_or_None: set of distinct values}."""
        return _fold_blocks_file(
            fpath, pq_mod, key_cols, column, conj, wide, _block_pairs
        )

    infos = parquet_file_infos(os.path.join(out_path, "blocks"))
    if sum(s for _p, s in infos) <= local_bytes:
        from xml2arrow_spark.sources.files import map_local_files

        total: dict = {}
        for fps in map_local_files(infos, _file_pairs):
            for kv, vs in fps.items():
                total.setdefault(kv, set()).update(vs)
                _cap_check(total)
        items = list(total.items())
        from pyspark.sql.pandas.types import to_arrow_schema
        from pyspark.sql.types import StructType

        key_ddl = ", ".join(by_name[kc] for kc in key_cols)
        lsch = to_arrow_schema(
            StructType.fromDDL(f"{key_ddl}, n_distinct bigint")
        )
        krows = [kv if isinstance(kv, tuple) else (kv,) for kv, _v in items]
        cols = {
            kc: pa.array([r[i] for r in krows], type=lsch.field(i).type)
            for i, kc in enumerate(key_cols)
        }
        cols["n_distinct"] = pa.array(
            [len(vs) for _kv, vs in items], type=pa.int64()
        )
        # arrow-backed LocalRelation — the KB-metadata finish rule
        return spark.createDataFrame(
            pa.table(cols), schema=f"{key_ddl}, n_distinct bigint"
        )

    from typing import Iterator

    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import StructType

    key_ddl = ", ".join(by_name[kc] for kc in key_cols)
    part_ddl = f"{key_ddl}, v " + ("string" if val_is_str else "bigint")
    out_schema = to_arrow_schema(StructType.fromDDL(part_ddl))

    def pair_files(batches: "Iterator[pa.RecordBatch]"):
        import pyarrow.parquet as pq

        from xml2arrow_spark.env import limit_arrow_threads

        limit_arrow_threads(1)
        for b in batches:
            path_lists = b.column(b.schema.get_field_index("path")).to_pylist()
            for fpath in (p for paths in path_lists for p in paths):
                tally = _file_pairs(fpath, pq)
                if not tally:
                    continue
                ks: list = [[] for _ in key_cols]
                vs: list = []
                for kv, vv in tally.items():
                    t = kv if isinstance(kv, tuple) else (kv,)
                    for i in range(len(key_cols)):
                        ks[i] += [t[i]] * len(vv)
                    vs += list(vv)
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(ks[i], type=out_schema.field(i).type)
                        for i in range(len(key_cols))
                    ] + [pa.array(vs, type=out_schema.field(len(key_cols)).type)],
                    names=list(key_cols) + ["v"],
                )

    tasks = plan_parquet_tasks(spark, os.path.join(out_path, "blocks"), n_tasks)
    # per-file partials are already distinct; the global dedup is ONE
    # (key, value) shuffle bounded by files x true_distinct, then a
    # KB-scale grouped count
    pairs = tasks.mapInArrow(pair_files, part_ddl).distinct()
    return pairs.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct")
    )
