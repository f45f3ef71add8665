"""Table encode: DataFrame -> blocks DataFrame via ``mapInArrow``.

Execution model (Spark-first, no per-row Python):

- The input stays a DataFrame; Catalyst prunes to exactly the manifest's
  columns before the exchange (column pruning = the reference's path-trie
  skip, /root/reference/src/path_registry.rs:393-427, for free).
- Each task re-chunks its Arrow stream into ``block_rows`` blocks and runs
  the numpy kernels — the per-partition analog of the reference's
  per-document fresh builders (/root/reference/src/xml_parser.rs:560-575).
- Output is ONE ROW PER BLOCK with an ``array<struct>`` of per-column
  encodings, so decode needs **no shuffle and no join** — a straight
  ``mapInArrow`` inverse. At 100 TB this is the difference between a map-only
  second pass and a petascale shuffle.
"""

from __future__ import annotations

import json
from typing import Iterator

import pyarrow as pa

from xml2arrow_spark.manifest import CodecManifest
# row-level predicate kernels (row_match_mask, match_decode_column) live
# next to the codec internals so the codec-aware fast paths and the row
# path share one implementation; re-exported here because decode callers
# (dataset.py, tests) import them from this module
from xml2arrow_spark.operators.blocks import (
    decode_column,
    encode_column,
    group_sum_column,
    match_decode_column,
    match_mask_column,
    row_match_mask,
    value_counts_column,
)

__all__ = [
    "encode_table",
    "encode_parquet",
    "encode_parquet_tasks",
    "decode_table",
    "prune_blocks",
    "prune_blocks_any",
    "prune_blocks_dnf",
    "normalize_zone_filters",
    "split_schema_ddl",
    "BLOCKS_SCHEMA_DDL",
    "blocks_metadata",
    "wide_blocks_ddl",
]

BLOCKS_SCHEMA_DDL = (
    "part_id int, unit_id int, block_id long, n_rows int, n_values long, "
    "in_bytes long, out_bytes long, "
    "cols array<struct<name: string, codec: string, meta: string, data: binary, "
    "in_bytes: long, out_bytes: long, "
    "vmin_i: long, vmax_i: long, vmin_d: double, vmax_d: double, "
    "vmin_s: string, vmax_s: string, n_null: long, zsum_i: long>>"
)

_BLOCKS_PA_SCHEMA = pa.schema(
    [
        pa.field("part_id", pa.int32()),
        pa.field("unit_id", pa.int32()),
        pa.field("block_id", pa.int64()),
        pa.field("n_rows", pa.int32()),
        pa.field("n_values", pa.int64()),
        pa.field("in_bytes", pa.int64()),
        pa.field("out_bytes", pa.int64()),
        pa.field(
            "cols",
            pa.list_(
                pa.struct(
                    [
                        pa.field("name", pa.string()),
                        pa.field("codec", pa.string()),
                        pa.field("meta", pa.string()),
                        pa.field("data", pa.binary()),
                        pa.field("in_bytes", pa.int64()),
                        pa.field("out_bytes", pa.int64()),
                        # zone map: per-block min/max of the column's values
                        # (int64 for integer/list columns, double for floats,
                        # truncation-safe bounds for strings; None when
                        # unknown/NaN/empty -> never pruned)
                        pa.field("vmin_i", pa.int64()),
                        pa.field("vmax_i", pa.int64()),
                        pa.field("vmin_d", pa.float64()),
                        pa.field("vmax_d", pa.float64()),
                        pa.field("vmin_s", pa.string()),
                        pa.field("vmax_s", pa.string()),
                        # aggregate stats (r05): row-level null count and
                        # provably-exact int64 value sum (None = unavailable)
                        pa.field("n_null", pa.int64()),
                        pa.field("zsum_i", pa.int64()),
                    ]
                )
            ),
        ),
    ]
)


def _blockify(batches: Iterator[pa.RecordBatch], block_rows: int) -> Iterator[pa.Table]:
    """Re-chunk an Arrow batch stream into ~block_rows tables (zero-copy slices)."""
    buf: list[pa.RecordBatch] = []
    buffered = 0
    for b in batches:
        buf.append(b)
        buffered += b.num_rows
        while buffered >= block_rows:
            tbl = pa.Table.from_batches(buf)
            yield tbl.slice(0, block_rows)
            rest = tbl.slice(block_rows)
            buf = rest.to_batches()
            buffered = rest.num_rows
    if buffered:
        yield pa.Table.from_batches(buf)


def _blockify_grouped(
    batches: Iterator[pa.RecordBatch], block_rows: int, unit_col: str
) -> Iterator[tuple[int, pa.Table]]:
    """Like :func:`_blockify` but never lets a block span two ``unit_col``
    values. Requires rows sorted by ``unit_col`` within the task (the caller
    does ``sortWithinPartitions``). Unit-run splitting is one vectorized diff
    per batch — no per-row Python."""
    import numpy as np

    def flush(unit, buf):
        tbl = pa.Table.from_batches(buf)
        for off in range(0, max(tbl.num_rows, 1), block_rows):
            sl = tbl.slice(off, block_rows)
            if sl.num_rows:
                yield unit, sl

    cur_unit = None
    buf: list[pa.RecordBatch] = []
    for b in batches:
        units = b.column(b.schema.get_field_index(unit_col)).to_numpy(zero_copy_only=False)
        if units.size == 0:
            continue
        starts = np.concatenate(([0], np.flatnonzero(units[1:] != units[:-1]) + 1, [units.size]))
        for i in range(len(starts) - 1):
            lo, hi = int(starts[i]), int(starts[i + 1])
            unit = int(units[lo])
            if unit != cur_unit and buf:
                yield from flush(cur_unit, buf)
                buf = []
            cur_unit = unit
            buf.append(b.slice(lo, hi - lo))
    if buf:
        yield from flush(cur_unit, buf)


_ZONE_STR_MAX = 64  # stored string-bound length cap (parquet-statistics style)


def _zone_str_bounds(lo: str, hi: str):
    """Truncation-safe string zone bounds: any PREFIX of the min is still a
    valid lower bound; for the max, the truncated prefix must be bumped
    above the true value (increment the last incrementable codepoint,
    skipping the surrogate gap) or withheld — the same rule parquet
    applies to its column statistics."""
    lo_t = lo[:_ZONE_STR_MAX]
    if len(hi) <= _ZONE_STR_MAX:
        return lo_t, hi
    p = hi[:_ZONE_STR_MAX]
    for i in reversed(range(len(p))):
        c = ord(p[i])
        if c < 0x10FFFF:
            nxt = 0xE000 if 0xD7FF <= c < 0xE000 else c + 1
            return lo_t, p[:i] + chr(nxt)
    return lo_t, None  # un-incrementable prefix: no safe upper bound


def _zone_stats(arr: pa.Array):
    """Per-block column statistics: zone-map (min, max) for pruning — int64
    pair for integer/list-of-int columns, double pair for floats, string
    pair (truncation-safe bounds) for strings — plus two AGGREGATE stats
    (r05 metadata-only aggregation): ``n_null`` (row-level null count, any
    type) and ``zsum_i`` (exact int64 sum over the block's non-null values,
    flattened elements for list-of-int columns). Bound-None always means
    "never prune this block"; a None ``zsum_i`` means "sum not available
    from metadata" (non-integer column, or a sum not PROVABLY exact in
    int64 — the bound below). Stats can only skip work, never change
    results. Returns an 8-tuple
    (vmin_i, vmax_i, vmin_d, vmax_d, vmin_s, vmax_s, n_null, zsum_i)."""
    import math

    import pyarrow.compute as pc

    from xml2arrow_spark.codecs.bitpack import bits_needed

    t = arr.type
    target = arr.flatten() if (pa.types.is_list(t) or pa.types.is_large_list(t)) else arr
    if pa.types.is_timestamp(target.type) or pa.types.is_date(target.type):
        # temporal columns take INTEGER zone stats in their storage unit
        # (epoch ticks / days — matching the block encoding), so
        # time-range predicates prune like any int range; the integer
        # branch's provable-exactness bound handles zsum_i (epoch-micros
        # magnitudes ~2^51 make it None for all but tiny blocks)
        target = target.cast(pa.int32() if pa.types.is_date(target.type)
                             else pa.int64())
        if target.type != pa.int64():
            target = target.cast(pa.int64())
    n_null = int(arr.null_count)
    none6 = (None, None, None, None, None, None)
    if len(target) == 0 or target.null_count == len(target):
        # no bounds to state; an integer block with zero non-null values
        # still has a KNOWN sum (the additive identity), so roll-ups over
        # blocks stay exact
        zsum = 0 if pa.types.is_integer(target.type) else None
        return none6 + (n_null, zsum)
    if pa.types.is_integer(target.type):
        mm = pc.min_max(target)
        lo, hi = mm["min"].as_py(), mm["max"].as_py()
        # provable exactness: |sum| <= nv * max(|lo|,|hi|) < 2^63 whenever
        # bits(magnitude) + bits(count) fits — Arrow's int64 accumulator
        # cannot overflow on ANY intermediate, so the stored sum is exact,
        # never a wrapped value. Out of bounds -> None (unavailable), the
        # aggregate surface then refuses rather than misreports.
        nv = len(target) - target.null_count
        m = max(abs(lo), abs(hi), 1)
        zsum = None
        if bits_needed(m) + bits_needed(nv) <= 62:
            zsum = int(pc.sum(target).as_py())
        return lo, hi, None, None, None, None, n_null, zsum
    if pa.types.is_floating(target.type):
        # min_max skips NaN — safe for RANGE pruning because NaN can never
        # satisfy lo <= v <= hi; all-NaN blocks yield None/None (kept).
        # No float sum: a metadata roll-up cannot reproduce a sequential
        # fold's rounding, and these stats never approximate.
        mm = pc.min_max(target)
        lo, hi = mm["min"].as_py(), mm["max"].as_py()
        # all-NaN blocks degenerate to (inf, -inf) — withhold stats (kept)
        if lo is None or hi is None or math.isnan(lo) or math.isnan(hi) or lo > hi:
            return none6 + (n_null, None)
        return None, None, float(lo), float(hi), None, None, n_null, None
    if pa.types.is_string(target.type) or pa.types.is_large_string(target.type):
        # Arrow min_max orders strings by bytes = codepoint order in UTF-8,
        # the same ordering Spark/DuckDB string comparisons use
        mm = pc.min_max(target)
        lo, hi = mm["min"].as_py(), mm["max"].as_py()
        if lo is None or hi is None:
            return none6 + (n_null, None)
        lo_t, hi_t = _zone_str_bounds(lo, hi)
        return None, None, None, None, lo_t, hi_t, n_null, None
    return none6 + (n_null, None)


def _encode_block(
    block: pa.Table,
    cols: list[str],
    policies: dict[str, str],
    part_id: int,
    unit_id: int,
    block_id: int,
    zone_maps: bool = True,
    required: frozenset = frozenset(),
) -> pa.RecordBatch:
    """Encode one bounded block (all manifest columns over the same row span)
    into a single blocks-schema row. Shared by the DataFrame and the fused
    parquet paths so their outputs are byte-identical.

    ``required`` = columns whose ColumnPolicy declares ``nullable=False``.
    A null there raises :class:`EncodeValueError` — the MissingRequiredField
    analog (/root/reference/src/xml_parser.rs:327-338) — EXCEPT strings,
    where the reference's rule maps a missing non-nullable Utf8 to ``""``;
    the engine applies the same fill (decode then yields ``""``, not null)."""
    from xml2arrow_spark.errors import EncodeValueError

    n_rows = block.num_rows
    out_cols = []
    n_values = 0
    in_bytes = 0
    out_bytes = 0
    for name in cols:
        arr = block.column(name).combine_chunks()
        if name in required and arr.null_count:
            if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
                arr = arr.fill_null("")
            else:
                raise EncodeValueError(
                    f"column {name!r}: {arr.null_count} null value(s) in a "
                    f"column declared nullable=False (missing required field)"
                )
        col_in = arr.nbytes
        resolved, meta_json, payload = encode_column(arr, policies[name])
        col_out = len(payload) + len(meta_json)
        meta = json.loads(meta_json)
        if meta["kind"] == "general":  # cascade wrapper: account the inner
            meta = json.loads(meta["inner"])
        if meta["kind"] in ("list_int", "list_float"):
            n_values += meta["values_meta"]["n"]
        else:
            n_values += meta["n"]
        in_bytes += col_in
        out_bytes += col_out
        zmin_i, zmax_i, zmin_d, zmax_d, zmin_s, zmax_s, z_nnull, z_sum = (
            _zone_stats(arr) if zone_maps else (None,) * 8
        )
        out_cols.append(
            {
                "name": name,
                "codec": resolved,
                "meta": meta_json,
                "data": payload,
                "in_bytes": col_in,
                "out_bytes": col_out,
                "vmin_i": zmin_i,
                "vmax_i": zmax_i,
                "vmin_d": zmin_d,
                "vmax_d": zmax_d,
                "vmin_s": zmin_s,
                "vmax_s": zmax_s,
                "n_null": z_nnull,
                "zsum_i": z_sum,
            }
        )
    return pa.RecordBatch.from_pydict(
        {
            "part_id": [part_id],
            "unit_id": [unit_id],
            "block_id": [block_id],
            "n_rows": [n_rows],
            "n_values": [n_values],
            "in_bytes": [in_bytes],
            "out_bytes": [out_bytes],
            "cols": [out_cols],
        },
        schema=_BLOCKS_PA_SCHEMA,
    )


def wide_blocks_ddl(cols: list[str]) -> str:
    """Blocks DDL for ``layout='wide'``: one (codec, meta, data) column
    TRIPLE per encoded column at the TOP level of the schema. Unlike the
    default array<struct> ``cols`` layout, parquet can column-prune a wide
    blocks table: decoding 1 of k columns reads ~1/k of the payload bytes —
    the decode-side analog of the reference's unknown-subtree skip
    (/root/reference/src/path_registry.rs:400-408)."""
    per_col = ", ".join(
        f"c_{name}__codec string, c_{name}__meta string, c_{name}__data binary, "
        f"c_{name}__vmin_i long, c_{name}__vmax_i long, "
        f"c_{name}__vmin_d double, c_{name}__vmax_d double, "
        f"c_{name}__vmin_s string, c_{name}__vmax_s string, "
        f"c_{name}__n_null long, c_{name}__zsum_i long"
        for name in cols
    )
    return (
        "part_id int, unit_id int, block_id long, n_rows int, n_values long, "
        f"in_bytes long, out_bytes long, {per_col}"
    )


def wide_pa_schema(cols: list[str]) -> pa.Schema:
    """Arrow schema matching :func:`wide_blocks_ddl` (for direct pyarrow
    writers, e.g. the dataset sink's wide layout)."""
    fields = [_BLOCKS_PA_SCHEMA.field(i) for i in range(7)]
    for name in cols:
        fields += [
            pa.field(f"c_{name}__codec", pa.string()),
            pa.field(f"c_{name}__meta", pa.string()),
            pa.field(f"c_{name}__data", pa.binary()),
            pa.field(f"c_{name}__vmin_i", pa.int64()),
            pa.field(f"c_{name}__vmax_i", pa.int64()),
            pa.field(f"c_{name}__vmin_d", pa.float64()),
            pa.field(f"c_{name}__vmax_d", pa.float64()),
            pa.field(f"c_{name}__vmin_s", pa.string()),
            pa.field(f"c_{name}__vmax_s", pa.string()),
            pa.field(f"c_{name}__n_null", pa.int64()),
            pa.field(f"c_{name}__zsum_i", pa.int64()),
        ]
    return pa.schema(fields)


def _widen_block(row_batch: pa.RecordBatch, cols: list[str]) -> pa.RecordBatch:
    """One array<struct> block row -> the wide layout."""
    entries = row_batch.column(7)[0].as_py()
    by_name = {e["name"]: e for e in entries}
    arrays = [row_batch.column(i) for i in range(7)]
    names = [row_batch.schema.field(i).name for i in range(7)]
    for name in cols:
        e = by_name[name]
        arrays += [
            pa.array([e["codec"]], type=pa.string()),
            pa.array([e["meta"]], type=pa.string()),
            pa.array([e["data"]], type=pa.binary()),
            pa.array([e["vmin_i"]], type=pa.int64()),
            pa.array([e["vmax_i"]], type=pa.int64()),
            pa.array([e["vmin_d"]], type=pa.float64()),
            pa.array([e["vmax_d"]], type=pa.float64()),
            pa.array([e["vmin_s"]], type=pa.string()),
            pa.array([e["vmax_s"]], type=pa.string()),
            pa.array([e["n_null"]], type=pa.int64()),
            pa.array([e["zsum_i"]], type=pa.int64()),
        ]
        names += [
            f"c_{name}__codec", f"c_{name}__meta", f"c_{name}__data",
            f"c_{name}__vmin_i", f"c_{name}__vmax_i",
            f"c_{name}__vmin_d", f"c_{name}__vmax_d",
            f"c_{name}__vmin_s", f"c_{name}__vmax_s",
            f"c_{name}__n_null", f"c_{name}__zsum_i",
        ]
    return pa.RecordBatch.from_arrays(arrays, names=names)


def encode_table(
    df,
    manifest: CodecManifest,
    unit_col: str | None = None,
    layout: str = "nested",
    presort: list[str] | None = None,
):
    """Encode ``df``'s manifest columns into a blocks DataFrame.

    The manifest is validated driver-side first (``Config::validate`` analog,
    /root/reference/src/config.rs:152-237) so executor tasks can never see an
    invalid plan.

    With ``unit_col`` set, rows are sorted by it within each task and no
    block spans two unit values; block rows carry ``unit_id`` — the handle
    the checkpoint/resume layer keys on. Without it, ``unit_id`` is -1.

    ``layout='nested'`` (default) emits one ``cols array<struct>`` column;
    ``layout='wide'`` emits per-column top-level (codec, meta, data)
    triples so a persisted blocks table supports parquet column pruning on
    decode (:func:`wide_blocks_ddl`).

    ``presort=[cols...]`` reorders rows WITHIN each task before blocking —
    no shuffle, one in-task sort. Row permutation is the classic RLE/dict
    amplifier ("Column Partition and Permutation for Run Length Encoding in
    Columnar Databases", SIGMOD 2020): interleaved low-cardinality values
    become long runs, often collapsing a column to a handful of RLE runs
    per block. Decode order changes accordingly (the engine's contract is
    per-row equality keyed by ids, not global order — same as the
    reference's document-order guarantee being per-scope).
    """
    manifest.validate(df.drop(unit_col).schema if unit_col else df.schema)
    cols = manifest.encodable_columns(df.schema)
    if not cols:
        raise ValueError("manifest selects no encodable columns")
    policies = {c: manifest.columns[c].codec for c in cols}
    required = frozenset(c for c in cols if not manifest.columns[c].nullable)
    block_rows = manifest.block_rows
    if unit_col is None:
        # NOTE (r06): no widen_scan here — encode respects the CALLER's
        # partitioning (an explicit coalesce/repartition upstream is a
        # deliberate block-geometry choice; test_files_encode pins the
        # fused path against encode_table(coalesce(1)) byte-for-byte).
        # Small-scan fan-out happens at the sources instead
        # (tokenize_documents).
        projected = df.select(*cols)  # Catalyst prunes the scan to these columns
        if presort:
            projected = projected.sortWithinPartitions(*presort)
    else:
        projected = df.select(unit_col, *cols).sortWithinPartitions(unit_col)

    wide = layout == "wide"
    if layout not in ("nested", "wide"):
        raise ValueError(f"unknown blocks layout {layout!r}")
    zone_maps_on = manifest.zone_maps

    def encode_fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        part_id = ctx.partitionId() if ctx is not None else 0
        if unit_col is None:
            blocks_iter = ((-1, blk) for blk in _blockify(batches, block_rows))
        else:
            blocks_iter = _blockify_grouped(batches, block_rows, unit_col)
        for seq, (unit_id, block) in enumerate(blocks_iter):
            enc = _encode_block(
                block, cols, policies, part_id, unit_id, (part_id << 32) | seq,
                zone_maps=zone_maps_on, required=required,
            )
            yield _widen_block(enc, cols) if wide else enc

    ddl = wide_blocks_ddl(cols) if wide else BLOCKS_SCHEMA_DDL
    return projected.mapInArrow(encode_fn, ddl)


def resolve_manifest_parquet(
    path: str, manifest: CodecManifest, sample_rows: int = 8192
) -> CodecManifest:
    """Driver-side manifest resolution straight from parquet footers/pages —
    no Spark job at all (the ``Parser::new`` compile step,
    /root/reference/src/xml_parser.rs:763-784). Reads at most ``sample_rows``
    rows from the first file(s) with pyarrow and runs the same choosers the
    block-side 'auto' path uses."""
    import pyarrow.parquet as pq

    from xml2arrow_spark.sources.files import parquet_file_infos

    infos = parquet_file_infos(path)
    batches = []
    remaining = sample_rows
    for fpath, _ in infos:
        if remaining <= 0:
            break
        for batch in pq.ParquetFile(fpath).iter_batches(batch_size=min(remaining, 65536)):
            batches.append(batch)
            remaining -= batch.num_rows
            if remaining <= 0:
                break
    sample = pa.Table.from_batches(batches) if batches else None
    if sample is None:
        return manifest

    from dataclasses import replace

    import numpy as np

    from xml2arrow_spark.codecs.base import strdata_from_arrow
    from xml2arrow_spark.plans.selector import choose_int_codec, choose_str_codec

    resolved = {}
    for name, policy in manifest.columns.items():
        # preserve a "+zstd"/"+lz4" cascade suffix; resolve the base only
        base, _, general = policy.codec.partition("+")
        sfx = f"+{general}" if general else ""
        if base != "auto" or name not in sample.column_names:
            resolved[name] = policy
            continue
        arr = sample.column(name).combine_chunks()
        if len(arr) == 0:
            resolved[name] = policy
        elif pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
            values = np.asarray(arr.flatten())
            if pa.types.is_floating(arr.type.value_type):
                from xml2arrow_spark.codecs.floats import choose_float_codec

                resolved[name] = replace(
                    policy,
                    codec=choose_float_codec(values, cascade=general or None)
                    + sfx,
                )
            else:
                resolved[name] = replace(
                    policy, codec=choose_int_codec(values) + sfx
                )
        elif pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
            # sample-based caller: cost a canonical encode block, with the
            # plain_str hysteresis (same rule as resolve_manifest — this
            # path previously passed no target_rows and silently lost both
            # the scale-invariant costing and the stability guard)
            resolved[name] = replace(
                policy,
                codec=choose_str_codec(
                    strdata_from_arrow(arr.drop_null()),
                    target_rows=manifest.block_rows,
                )
                + sfx,
            )
        elif pa.types.is_floating(arr.type):
            from xml2arrow_spark.codecs.floats import choose_float_codec

            resolved[name] = replace(
                policy,
                codec=choose_float_codec(
                    np.asarray(arr.drop_null()), cascade=general or None
                )
                + sfx,
            )
        elif pa.types.is_boolean(arr.type):
            resolved[name] = replace(policy, codec="bool_pack" + sfx)
        else:
            resolved[name] = replace(
                policy, codec=choose_int_codec(np.asarray(arr.drop_null())) + sfx
            )
    return CodecManifest(
        columns=resolved, block_rows=manifest.block_rows,
        version=manifest.version, zone_maps=manifest.zone_maps,
    )


def encode_parquet_tasks(tasks_df, manifest: CodecManifest):
    """Fused pyarrow scan + encode over a file-task DataFrame
    (:func:`xml2arrow_spark.sources.files.plan_parquet_tasks`).

    Each task opens its files with pyarrow and streams
    parquet -> Arrow -> numpy kernels with no JVM row materialization — the
    path that makes the Python boundary disappear (see sources/files.py
    module doc; measured 20-30x over row-fed ``mapInArrow``). Blocks never
    span files; ``unit_id`` = ``file_idx`` is the resume key. Column pruning
    happens in the pyarrow reader (only manifest columns are decoded), the
    engine-side analog of the reference's unknown-subtree skip
    (/root/reference/src/path_registry.rs:400-408).
    """
    cols = [name for name in manifest.columns]
    policies = {c: manifest.columns[c].codec for c in cols}
    required = frozenset(c for c in cols if not manifest.columns[c].nullable)
    block_rows = manifest.block_rows
    zone_maps_on = manifest.zone_maps

    def encode_files(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.parquet as pq

        from pyspark import TaskContext

        from xml2arrow_spark.env import limit_arrow_threads

        limit_arrow_threads(1)  # one Spark task = one parallel unit
        ctx = TaskContext.get()
        part_id = ctx.partitionId() if ctx is not None else 0
        seq = 0
        for b in batches:
            idx_lists = b.column(b.schema.get_field_index("file_idx")).to_pylist()
            path_lists = b.column(b.schema.get_field_index("path")).to_pylist()
            for file_idx, fpath in (
                (i, p)
                for idxs, paths in zip(idx_lists, path_lists)
                for i, p in zip(idxs, paths)
            ):
                pf = pq.ParquetFile(fpath)
                for block in _blockify(
                    pf.iter_batches(batch_size=block_rows, columns=cols), block_rows
                ):
                    yield _encode_block(
                        block, cols, policies, part_id, file_idx,
                        (part_id << 32) | seq, zone_maps=zone_maps_on,
                        required=required,
                    )
                    seq += 1

    return tasks_df.mapInArrow(encode_files, BLOCKS_SCHEMA_DDL)


ENCODE_STATS_DDL = (
    "unit_id int, n_blocks int, n_rows long, n_values long, "
    "in_bytes long, out_bytes long"
)

_STATS_PA_SCHEMA = pa.schema(
    [
        pa.field("unit_id", pa.int32()),
        pa.field("n_blocks", pa.int32()),
        pa.field("n_rows", pa.int64()),
        pa.field("n_values", pa.int64()),
        pa.field("in_bytes", pa.int64()),
        pa.field("out_bytes", pa.int64()),
    ]
)


def encode_parquet_stats(
    spark,
    path: str,
    manifest: CodecManifest | None = None,
    n_tasks: int | None = None,
):
    """Fused scan+encode that returns per-file METADATA only — the encoded
    payload is produced and dropped in the task, never shipped to the JVM.

    This is the throughput-measurement twin of :func:`encode_parquet`
    (mirroring the reference's benchmark harness, which parses into
    RecordBatches and discards them,
    /root/reference/benches/parse_benchmark.rs:415-455): the kernel work is
    identical, only result transport differs. Also the right shape for
    dry-run codec planning over a large table."""
    from pyspark.sql.pandas.types import from_arrow_schema

    import pyarrow.parquet as pq

    from xml2arrow_spark.sources.files import parquet_file_infos, plan_parquet_tasks

    first = parquet_file_infos(path)[0][0]
    file_schema = from_arrow_schema(pq.read_schema(first))
    if manifest is None:
        manifest = CodecManifest.auto_for(file_schema, block_rows=65536)
    manifest.validate(file_schema)
    resolved = resolve_manifest_parquet(path, manifest)
    tasks = plan_parquet_tasks(spark, path, n_tasks)
    cols = list(resolved.columns)
    policies = {c: resolved.columns[c].codec for c in cols}
    required = frozenset(c for c in cols if not resolved.columns[c].nullable)
    block_rows = resolved.block_rows

    def encode_stats(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.parquet as pq

        from xml2arrow_spark.env import limit_arrow_threads

        limit_arrow_threads(1)
        for b in batches:
            idx_lists = b.column(b.schema.get_field_index("file_idx")).to_pylist()
            path_lists = b.column(b.schema.get_field_index("path")).to_pylist()
            for file_idx, fpath in (
                (i, p)
                for idxs, paths in zip(idx_lists, path_lists)
                for i, p in zip(idxs, paths)
            ):
                pf = pq.ParquetFile(fpath)
                nb = nr = nv = ib = ob = 0
                for seq, block in enumerate(
                    _blockify(
                        pf.iter_batches(batch_size=block_rows, columns=cols),
                        block_rows,
                    )
                ):
                    enc = _encode_block(
                        block, cols, policies, 0, file_idx, seq,
                        required=required,
                    )
                    nb += 1
                    nr += enc.column(3)[0].as_py()
                    nv += enc.column(4)[0].as_py()
                    ib += enc.column(5)[0].as_py()
                    ob += enc.column(6)[0].as_py()
                yield pa.RecordBatch.from_pydict(
                    {
                        "unit_id": [file_idx],
                        "n_blocks": [nb],
                        "n_rows": [nr],
                        "n_values": [nv],
                        "in_bytes": [ib],
                        "out_bytes": [ob],
                    },
                    schema=_STATS_PA_SCHEMA,
                )

    return tasks.mapInArrow(encode_stats, ENCODE_STATS_DDL)


def encode_parquet(
    spark,
    path: str,
    manifest: CodecManifest | None = None,
    n_tasks: int | None = None,
):
    """Convenience: plan balanced file tasks over ``path``, resolve the
    manifest driver-side from the parquet sample, and return the fused-encode
    blocks DataFrame. The flagship ingest path (BASELINE.json north_star)."""
    from pyspark.sql.pandas.types import from_arrow_schema

    import pyarrow.parquet as pq

    from xml2arrow_spark.sources.files import parquet_file_infos, plan_parquet_tasks

    first = parquet_file_infos(path)[0][0]
    file_schema = from_arrow_schema(pq.read_schema(first))
    if manifest is None:
        manifest = CodecManifest.auto_for(file_schema, block_rows=65536)
    manifest.validate(file_schema)
    resolved = resolve_manifest_parquet(path, manifest)
    tasks = plan_parquet_tasks(spark, path, n_tasks)
    return encode_parquet_tasks(tasks, resolved)


def split_schema_ddl(ddl: str) -> dict[str, str]:
    """name -> "name type" pairs from a stored schema DDL, splitting on
    commas OUTSIDE parentheses AND angle brackets — ``decimal(20,0)``,
    ``array<struct<a:int,b:int>>``, ``map<string,int>`` all contain
    commas a naive ``split(',')`` would tear."""
    pairs, depth, cur = [], 0, []
    for ch in ddl:
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        if ch == "," and depth == 0:
            pairs.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        pairs.append("".join(cur).strip())
    return {p.split(" ")[0]: p for p in pairs if p}


def _zone_suffixes(lo, hi) -> tuple[str, str]:
    """Zone-stat column pair for a predicate's bound type. A ``None``
    bound is one-sided — the pair is typed by the bound that IS present
    (previously a one-sided int/string range fell through to the float
    pair, whose null-filled stats kept every block: sound, but the prune
    was silently vacuous)."""
    probe = [b for b in (lo, hi) if b is not None]
    if probe and all(isinstance(b, str) for b in probe):
        return "vmin_s", "vmax_s"
    if probe and all(
        isinstance(b, int) and not isinstance(b, bool) for b in probe
    ):
        return "vmin_i", "vmax_i"
    return "vmin_d", "vmax_d"


def normalize_zone_filters(zone_filter) -> list[tuple]:
    """``zone_filter`` may be one (column, lo, hi) tuple or a LIST of them
    (a conjunction — a block survives only if every predicate can match
    it). Returns the list form.

    ``any_of(...)`` (:mod:`~xml2arrow_spark.operators.predicates`) lifts
    the filter to a DISJUNCTION of such conjunctions: the returned list is
    then flat across every disjunct with the disjunct spans attached
    (``.groups``), and the pruning consumers keep a block when ANY
    disjunct could match it (ranges with at least one bound — no IN-list
    shape; use ``prune_blocks_any`` for points)."""
    from xml2arrow_spark.operators.predicates import AnyOf, DnfConjuncts

    if zone_filter is None:
        return []
    if isinstance(zone_filter, AnyOf):
        flat: list[tuple] = []
        groups: list[tuple[int, int]] = []
        for d in zone_filter.disjuncts:
            sub = normalize_zone_filters(d)
            if not sub:
                raise ValueError("any_of disjuncts must be non-empty")
            for t in sub:
                if len(t) != 3 or (t[1] is None and t[2] is None):
                    raise ValueError(
                        "zone-filter disjuncts must be (column, lo, hi) "
                        f"ranges with at least one bound, got {t!r}"
                    )
            groups.append((len(flat), len(flat) + len(sub)))
            flat.extend(sub)
        if len(groups) == 1:  # any_of(x) IS x
            return flat
        return DnfConjuncts(flat, groups)
    if isinstance(zone_filter, tuple):
        return [zone_filter]
    return list(zone_filter)


def prune_blocks(blocks_df, column: str, lo, hi):
    """Zone-map block pruning: keep only blocks whose [vmin, vmax] for
    ``column`` can intersect [lo, hi] — parquet-row-group-pruning semantics
    at the engine's block granularity (the small-materialized-aggregates /
    range-encoding family, cf. "Global Range Encoding for Efficient
    Partition Elimination", EDBT 2018). CONSERVATIVE: blocks with missing
    stats are always kept, so the result is a superset of the matching rows
    and the caller still applies the row-level filter after decode.

    Integer bounds prune on the int64 zone pair, float bounds on the double
    pair (never cross-compared: an int64 -> double cast could round a bound
    across the predicate and wrongly drop a block), string bounds on the
    truncation-safe string pair (UTF-8 byte order — the ordering Spark's
    string comparison uses). On a persisted WIDE blocks table the zone
    columns are top-level parquet columns, so this filter also pushes down
    to parquet row-group statistics — two pruning levels from one set of
    stats.
    """
    return blocks_df.filter(_prune_keep_cond(blocks_df, column, lo, hi))


def _prune_keep_cond(blocks_df, column: str, lo, hi):
    """:func:`prune_blocks`'s keep condition as a Column (missing stats
    always keep), composable into conjunctions and disjunctions."""
    from pyspark.sql import functions as F

    suffix_min, suffix_max = _zone_suffixes(lo, hi)
    if "cols" not in blocks_df.columns:  # wide layout
        vmin = F.col(f"c_{column}__{suffix_min}")
        vmax = F.col(f"c_{column}__{suffix_max}")
    else:
        entry = F.element_at(
            F.filter(F.col("cols"), lambda c: c["name"] == F.lit(column)), 1
        )
        vmin = entry[suffix_min]
        vmax = entry[suffix_max]
    cond = None
    if lo is not None:
        cond = F.lit(lo) <= vmax
    if hi is not None:
        c2 = vmin <= F.lit(hi)
        cond = c2 if cond is None else (cond & c2)
    if cond is None:  # both bounds open: nothing to prune on
        return F.lit(True)
    return vmin.isNull() | vmax.isNull() | cond


def prune_blocks_dnf(blocks_df, zfs):
    """Zone-map pruning for a DNF zone filter (``zfs`` from
    :func:`normalize_zone_filters` with ``.groups``): keep a block when
    ANY disjunct's every range can intersect it — the OR-pushdown rule
    parquet/Iceberg use (``Or(l, r)`` prunes only when both sides prune).
    Same conservative contract as :func:`prune_blocks`."""
    keep = None
    for a, b in zfs.groups:
        g = None
        for col, lo, hi in zfs[a:b]:
            c = _prune_keep_cond(blocks_df, col, lo, hi)
            g = c if g is None else (g & c)
        keep = g if keep is None else (keep | g)
    return blocks_df.filter(keep)


def prune_blocks_any(blocks_df, column: str, values: list):
    """Disjunctive zone-map pruning: keep only blocks whose [vmin, vmax]
    for ``column`` contains AT LEAST ONE of the point ``values`` — the
    point-lookup shape (:func:`prune_blocks` is the conjunctive range
    shape; a scattered id set is not expressible as one range). Same
    conservative contract: blocks with missing stats are always kept, the
    result is a superset, the caller row-filters after decode. The
    truncation-safe string bounds stay valid for containment (vmin is a
    prefix of the true min, vmax is raised above the true max, so
    ``vmin <= v <= vmax`` can only over-keep). Effective when blocks are
    value-clustered on ``column`` (``presort=[column]`` at encode); on
    unclustered data every block's range spans the id space and nothing
    prunes — still correct, just no win. The values ride a literal array
    (one O(len(values)) `exists` per block row, JVM-side), so callers
    should cap the list at metadata scale."""
    from pyspark.sql import functions as F

    if not values:
        return blocks_df
    suffix_min, suffix_max = _zone_suffixes(values[0], values[0])
    if "cols" not in blocks_df.columns:  # wide layout
        vmin = F.col(f"c_{column}__{suffix_min}")
        vmax = F.col(f"c_{column}__{suffix_max}")
    else:
        entry = F.element_at(
            F.filter(F.col("cols"), lambda c: c["name"] == F.lit(column)), 1
        )
        vmin = entry[suffix_min]
        vmax = entry[suffix_max]
    arr = F.array(*[F.lit(v) for v in values])
    keep = (
        vmin.isNull()
        | vmax.isNull()
        | F.exists(arr, lambda x: (vmin <= x) & (x <= vmax))
    )
    return blocks_df.filter(keep)


def normalize_row_filters(row_filter) -> list[tuple]:
    """Validate and split a row_filter spec into a CONJUNCTION list of
    ``(col, values|None, lo, hi)``: each conjunct is a 2-tuple
    ``(col, values)`` = point-set selection or a 3-tuple ``(col, lo, hi)``
    = inclusive range with optional open sides; ``row_filter`` may be one
    conjunct or a list of them. Filter columns need NOT be in the decoded
    projection — they are read for the mask and dropped (filter on the id,
    project the text).

    ``row_filter`` may also be an :class:`~xml2arrow_spark.operators
    .predicates.AnyOf` (``any_of(...)``) — a DISJUNCTION of such
    conjunctions: the returned list is then the flat conjunct list with
    the disjunct spans attached (``.groups``), and
    :func:`apply_row_filters` ORs the per-disjunct masks."""
    from xml2arrow_spark.operators.predicates import AnyOf, DnfConjuncts

    if row_filter is None:
        return []
    if isinstance(row_filter, AnyOf):
        flat: list[tuple] = []
        groups: list[tuple[int, int]] = []
        for d in row_filter.disjuncts:
            sub = normalize_row_filters(d)
            if not sub:
                raise ValueError("any_of disjuncts must be non-empty")
            groups.append((len(flat), len(flat) + len(sub)))
            flat.extend(sub)
        if len(groups) == 1:  # any_of(x) IS x
            return flat
        return DnfConjuncts(flat, groups)
    preds = (
        [row_filter] if isinstance(row_filter, tuple) else list(row_filter)
    )
    out = []
    for pred in preds:
        rf_col = pred[0]
        rf_values = rf_lo = rf_hi = None
        if len(pred) == 3:
            rf_lo, rf_hi = pred[1], pred[2]
            if rf_lo is None and rf_hi is None:
                raise ValueError(
                    "range row_filter needs at least one bound (lo, hi)"
                )
        elif len(pred) == 2:
            rf_values = list(pred[1])
        else:
            raise ValueError(
                f"row_filter conjunct must be (col, values) or "
                f"(col, lo, hi), got {pred!r}"
            )
        out.append((rf_col, rf_values, rf_lo, rf_hi))
    return out


def apply_row_filters(rfs, pair, out_names):
    """Evaluate a row-filter conjunction over one block, codec-aware:
    returns ``None`` when NO row matches (the block skips every other
    kernel — including zone-filter false positives), else
    ``(mask, selected)`` where ``mask`` is the AND of the per-conjunct
    masks (or None when ``rfs`` is empty — every row) and ``selected``
    maps at most one projected filter column to its pre-gathered rows
    (the single-conjunct fused fast path of
    :func:`~xml2arrow_spark.operators.blocks.match_decode_column`).
    ``pair(col)`` yields a column's (meta_json, payload).

    Under a DNF row filter (``rfs`` carries ``.groups``) the mask is the
    OR of the per-disjunct conjunction masks — a row survives when any
    disjunct matches it; NULL/NaN rows fail every disjunct. The fused
    single-conjunct fast path stays conjunction-only (a DNF always has
    several conjuncts)."""
    import pyarrow.compute as pc

    if not rfs:
        return None, {}
    groups = getattr(rfs, "groups", None)
    if groups is not None:
        mask = None
        for a, b in groups:
            fr = apply_row_filters(list(rfs[a:b]), pair, ())
            if fr is None:
                continue  # this disjunct matched no row
            m, _sel = fr
            m = pc.fill_null(m, False)
            mask = m if mask is None else pc.or_(mask, m)
        if mask is None or not pc.any(mask).as_py():
            return None
        return mask, {}
    if len(rfs) == 1 and rfs[0][0] in out_names:
        col, vv, lo, hi = rfs[0]
        md = match_decode_column(*pair(col), vv, lo, hi)
        if md is None:
            return None
        mask, sel = md
        return mask, {col: sel}
    mask = None
    for col, vv, lo, hi in rfs:
        m = match_mask_column(*pair(col), vv, lo, hi)
        if m is None:
            return None
        mask = m if mask is None else pc.and_kleene(mask, m)
    mask = pc.fill_null(mask, False)
    if not pc.any(mask).as_py():
        return None
    return mask, {}




def decode_table(blocks_df, schema_ddl: str, zone_filter=None, row_filter=None):
    """Blocks DataFrame -> original columns. Map-only: no shuffle, no join.

    ``zone_filter=(column, lo, hi)`` — or a LIST of such tuples, applied as
    a conjunction — prunes whole blocks via their zone maps BEFORE any
    decode kernel runs (:func:`prune_blocks`); the decoded result is a
    superset of the rows matching the predicate, so apply the row-level
    filter afterwards. Bounds may be int, float, or str (each pruning on
    its own stats pair).

    ``row_filter=(column, values)`` pushes point selection INSIDE the
    decode kernel — the query-on-compressed-data move (Abadi et al.,
    "Integrating Compression and Execution in Column-Oriented Database
    Systems", SIGMOD 2006, at block granularity): the filter column is
    decoded FIRST; a block with zero matches is skipped before any other
    column's kernel runs (which also discards zone/Bloom FALSE-POSITIVE
    blocks), and a block with matches decodes the remaining columns once
    and gathers only the matching rows. Unlike ``zone_filter`` the result
    is EXACT on the filter column (rows where ``column IN values``), and
    only KB of matches cross the Arrow boundary instead of every block's
    rows. Scalar filter columns only.

    ``row_filter=(column, lo, hi)`` (3-tuple) is the RANGE form of the
    same move: rows where ``lo <= column <= hi`` (inclusive; either side
    may be ``None`` for a one-sided range). NULL never matches; NaN never
    matches a finite range (IEEE comparisons). Pair it with the matching
    ``zone_filter`` so non-overlapping blocks skip before the filter
    column's kernel runs at all — the selective-scan shape: zone prune →
    in-kernel range select → only the matching rows' payload crosses the
    Arrow boundary.

    ``row_filter`` may also be a LIST of such tuples — a conjunction:
    each conjunct's mask evaluates codec-aware, the masks AND together,
    and a zero-match conjunct skips the block before any other kernel.
    Filter columns need NOT be in the decoded projection (filter on the
    id, project the text): their streams are read for the mask and
    dropped. ``any_of(...)`` (:mod:`~xml2arrow_spark.operators
    .predicates`) lifts either shape to a DISJUNCTION: per-disjunct
    conjunction masks OR together, and only a block NO disjunct matches
    skips.

    ``schema_ddl`` may name a SUBSET of the encoded columns. Nested layout:
    only the named entries are decoded (CPU pruning — the payload bytes of
    the others still ride in the ``cols`` struct). Wide layout (see
    :func:`wide_blocks_ddl`): the projection keeps only the named columns'
    (meta, data) pairs, so parquet-backed blocks tables ALSO skip the
    unneeded payload IO — true decode-side column pruning.
    """
    from pyspark.sql.types import StructType

    zfs = normalize_zone_filters(zone_filter)
    if getattr(zfs, "groups", None) is not None:
        blocks_df = prune_blocks_dnf(blocks_df, zfs)
    else:
        for zf in zfs:
            blocks_df = prune_blocks(blocks_df, *zf)
    out_schema = StructType.fromDDL(schema_ddl)
    out_names = [f.name for f in out_schema.fields]
    rfs = normalize_row_filters(row_filter)
    is_wide = "cols" not in blocks_df.columns

    if is_wide:
        read_names = list(dict.fromkeys(
            out_names + [c for c, _v, _l, _h in rfs]
        ))
        needed = [x for n in read_names for x in (f"c_{n}__meta", f"c_{n}__data")]
        missing = set(needed) - set(blocks_df.columns)
        if missing:
            raise ValueError(f"blocks table lacks columns for {sorted(missing)}")

        def decode_wide(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            for b in batches:
                for row in range(b.num_rows):
                    def pair(n):
                        return (
                            b.column(b.schema.get_field_index(f"c_{n}__meta"))[row].as_py(),
                            b.column(b.schema.get_field_index(f"c_{n}__data"))[row].as_py(),
                        )

                    def col(n):
                        return decode_column(*pair(n))

                    # codec-aware: each conjunct evaluates on the code
                    # stream where the codec allows, so a zero-match
                    # block skips without materializing a value
                    fr = apply_row_filters(rfs, pair, out_names)
                    if fr is None:
                        continue  # zero matches: skip every other kernel
                    mask, selected = fr
                    arrays = [
                        selected[n] if n in selected
                        else (col(n) if mask is None else col(n).filter(mask))
                        for n in out_names
                    ]
                    yield pa.RecordBatch.from_arrays(arrays, names=out_names)

        # the select is what lets the parquet scan prune payload columns
        return blocks_df.select(*needed).mapInArrow(decode_wide, schema_ddl)

    wanted = set(out_names)

    def decode_fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            cols_col = b.column(b.schema.get_field_index("cols"))
            for row in range(b.num_rows):
                # zero-copy struct view of this block's entries; only the
                # REQUESTED columns' payload bytes are ever materialized
                # (``as_py`` on the whole struct would copy every column's
                # payload just to decode a subset)
                entries = cols_col[row].values
                names = entries.field("name").to_pylist()
                metas = entries.field("meta")
                datas = entries.field("data")
                missing = wanted - set(names)
                if missing:
                    # mirror the wide path's explicit missing-column error
                    # (a bare KeyError from an executor is undiagnosable)
                    raise ValueError(
                        f"blocks table lacks encoded column(s) {sorted(missing)}; "
                        f"blocks contain {sorted(names)}"
                    )
                fr = apply_row_filters(
                    rfs,
                    lambda c: (
                        metas[names.index(c)].as_py(),
                        datas[names.index(c)].as_py(),
                    ),
                    out_names,
                )
                if fr is None:
                    continue  # zero matches: skip every other kernel
                mask, decoded = fr
                for i, nm in enumerate(names):
                    if nm in wanted and nm not in decoded:
                        arr = decode_column(metas[i].as_py(), datas[i].as_py())
                        decoded[nm] = arr.filter(mask) if mask is not None else arr
                arrays = [decoded[n] for n in out_names]
                yield pa.RecordBatch.from_arrays(arrays, names=out_names)

    return blocks_df.select("cols").mapInArrow(decode_fn, schema_ddl)


def blocks_metadata(blocks_df):
    """Blocks DataFrame -> lightweight per-block metadata (no payload bytes).

    This is what lands in the checkpoint manifest table; explode gives
    per-column codec lineage.
    """
    from pyspark.sql import functions as F

    return blocks_df.select(
        "part_id",
        "block_id",
        "n_rows",
        "n_values",
        "in_bytes",
        "out_bytes",
        F.transform(
            "cols",
            lambda c: F.struct(
                c["name"].alias("name"),
                c["codec"].alias("codec"),
                c["in_bytes"].alias("in_bytes"),
                c["out_bytes"].alias("out_bytes"),
            ),
        ).alias("col_codecs"),
    )
