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
from xml2arrow_spark.operators.blocks import decode_column, encode_column

__all__ = ["encode_table", "decode_table", "BLOCKS_SCHEMA_DDL", "blocks_metadata"]

BLOCKS_SCHEMA_DDL = (
    "part_id int, unit_id int, block_id long, n_rows int, n_values long, "
    "in_bytes long, out_bytes long, "
    "cols array<struct<name: string, codec: string, meta: string, data: binary, "
    "in_bytes: long, out_bytes: long>>"
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


def encode_table(df, manifest: CodecManifest, unit_col: str | None = None):
    """Encode ``df``'s manifest columns into a blocks DataFrame.

    The manifest is validated driver-side first (``Config::validate`` analog,
    /root/reference/src/config.rs:152-237) so executor tasks can never see an
    invalid plan.

    With ``unit_col`` set, rows are sorted by it within each task and no
    block spans two unit values; block rows carry ``unit_id`` — the handle
    the checkpoint/resume layer keys on. Without it, ``unit_id`` is -1.
    """
    manifest.validate(df.drop(unit_col).schema if unit_col else df.schema)
    cols = manifest.encodable_columns(df.schema)
    if not cols:
        raise ValueError("manifest selects no encodable columns")
    policies = {c: manifest.columns[c].codec for c in cols}
    block_rows = manifest.block_rows
    if unit_col is None:
        projected = df.select(*cols)  # Catalyst prunes the scan to these columns
    else:
        projected = df.select(unit_col, *cols).sortWithinPartitions(unit_col)

    def encode_fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        part_id = ctx.partitionId() if ctx is not None else 0
        if unit_col is None:
            blocks_iter = ((-1, blk) for blk in _blockify(batches, block_rows))
        else:
            blocks_iter = _blockify_grouped(batches, block_rows, unit_col)
        for seq, (unit_id, block) in enumerate(blocks_iter):
            n_rows = block.num_rows
            out_cols = []
            n_values = 0
            in_bytes = 0
            out_bytes = 0
            for name in cols:
                arr = block.column(name).combine_chunks()
                col_in = arr.nbytes
                resolved, meta_json, payload = encode_column(arr, policies[name])
                col_out = len(payload) + len(meta_json)
                meta = json.loads(meta_json)
                if meta["kind"] == "list_int":
                    n_values += meta["values_meta"]["n"]
                else:
                    n_values += meta["n"]
                in_bytes += col_in
                out_bytes += col_out
                out_cols.append(
                    {
                        "name": name,
                        "codec": resolved,
                        "meta": meta_json,
                        "data": payload,
                        "in_bytes": col_in,
                        "out_bytes": col_out,
                    }
                )
            yield pa.RecordBatch.from_pydict(
                {
                    "part_id": [part_id],
                    "unit_id": [unit_id],
                    "block_id": [(part_id << 32) | seq],
                    "n_rows": [n_rows],
                    "n_values": [n_values],
                    "in_bytes": [in_bytes],
                    "out_bytes": [out_bytes],
                    "cols": [out_cols],
                },
                schema=_BLOCKS_PA_SCHEMA,
            )

    return projected.mapInArrow(encode_fn, BLOCKS_SCHEMA_DDL)


def decode_table(blocks_df, schema_ddl: str):
    """Blocks DataFrame -> original columns. Map-only: no shuffle, no join."""
    from pyspark.sql.types import StructType

    out_schema = StructType.fromDDL(schema_ddl)
    out_names = [f.name for f in out_schema.fields]

    def decode_fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            cols_col = b.column(b.schema.get_field_index("cols"))
            for row in range(b.num_rows):
                entries = cols_col[row].as_py()
                decoded = {}
                for e in entries:
                    decoded[e["name"]] = decode_column(e["meta"], e["data"])
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
