"""File-level scan planning for the pyarrow-native encode path.

Why this exists: ``mapInArrow`` over a JVM parquet scan pays a
columnar->row->Arrow double conversion at the Python boundary (Spark's
``PythonMapInArrow`` feeds from row iterators). For an engine whose entire
data plane is vectorized Arrow kernels, that boundary dominates — measured
~20-30x slower than letting the Python worker read the parquet bytes
directly. So the flagship encode path ships *file splits*, not rows, through
Spark: the driver plans size-balanced file tasks (this module), executors
open the files with pyarrow and go parquet -> Arrow -> numpy kernels with
zero JVM row materialization.

This mirrors the reference's split between compile-once plan and streaming
execution (``Parser::new`` vs ``Parser::parse``,
/root/reference/src/xml_parser.rs:763-806): planning is a driver-side pure
function over file metadata; per-file state lives entirely in the task.

Scale notes (1000-executor / 100 TB):

- The task table is one row per FILE (path + bytes) — KB-scale per thousand
  files; it broadcasts/shuffles names, never payload.
- Balance uses greedy LPT (longest-processing-time) bin-packing on file
  size: deterministic, O(F log F) on the driver, bounds the makespan at
  4/3 OPT. At 100 TB with row-group-sized files this is what keeps stragglers
  off the encode stage without touching the data.
- ``file_idx`` is a stable unit id (position in the sorted file list), the
  checkpoint/resume key: completed files are anti-joined away on resume.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "parquet_file_infos",
    "plan_parquet_tasks",
    "scan_map_arrow",
    "TASKS_DDL",
]

# one row per TASK; files carried as parallel arrays. A per-file-row layout
# hash-repartitioned on task_id looks natural but is wrong at low task
# counts: hashing k distinct ids into k partitions leaves ~1/e of them empty
# and stacks 2-3 bins on others (measured: capped 4-core scaling at 1.2x).
# parallelize(rows, n_rows) pins exactly one bin per partition.
TASKS_DDL = (
    "task_id int, file_idx array<int>, path array<string>, bytes array<long>"
)


def parquet_file_infos(path: str) -> list[tuple[str, int]]:
    """[(absolute file path, size bytes)] for every ``*.parquet`` under
    ``path`` (a file or a directory), sorted by path for determinism.

    Local filesystem walk — the sandbox stand-in for the Iceberg/Hive file
    manifest; on a real catalog this is one metadata-table read.
    """
    path = path.removeprefix("file:")
    if os.path.isfile(path):
        return [(path, os.path.getsize(path))]
    infos: list[tuple[str, int]] = []
    for root, _dirs, names in os.walk(path):
        for name in names:
            if name.endswith(".parquet") and not name.startswith((".", "_")):
                full = os.path.join(root, name)
                infos.append((full, os.path.getsize(full)))
    infos.sort()
    if not infos:
        raise FileNotFoundError(f"no parquet files under {path!r}")
    return infos


def _lpt_assign(sizes: list[int], n_tasks: int) -> list[int]:
    """Greedy LPT: largest size -> currently-lightest bin. Returns the bin id
    per input index. Pure, deterministic (ties break on bin id)."""
    import heapq

    order = sorted(range(len(sizes)), key=lambda i: (-sizes[i], i))
    heap = [(0, b) for b in range(n_tasks)]
    heapq.heapify(heap)
    assignment = [0] * len(sizes)
    for i in order:
        load, b = heapq.heappop(heap)
        assignment[i] = b
        heapq.heappush(heap, (load + sizes[i], b))
    return assignment


def plan_parquet_tasks(
    spark: SparkSession, path: str, n_tasks: int | None = None
) -> DataFrame:
    """One row per TASK: (task_id, file_idx[], path[], bytes[]), size-balanced
    over ``n_tasks`` LPT bins, with exactly one row (bin) per Spark partition.

    ``file_idx`` values are the stable per-file unit ids used for checkpoint
    lineage.
    """
    if n_tasks is None:
        n_tasks = max(spark.sparkContext.defaultParallelism, 1)
    infos = parquet_file_infos(path)
    n_tasks = min(n_tasks, len(infos))
    bins = _lpt_assign([s for _, s in infos], n_tasks)
    per_task: dict[int, list[tuple[int, str, int]]] = {b: [] for b in range(n_tasks)}
    for i, (p, s) in enumerate(infos):
        per_task[bins[i]].append((i, p, s))
    rows = [
        (
            t,
            [f[0] for f in files],
            [f[1] for f in files],
            [f[2] for f in files],
        )
        for t, files in sorted(per_task.items())
        if files
    ]
    rdd = spark.sparkContext.parallelize(rows, len(rows))
    return spark.createDataFrame(rdd, TASKS_DDL)


def scan_map_arrow(
    spark: SparkSession,
    path: str,
    fn,
    output_ddl: str,
    columns: list[str] | None = None,
    n_tasks: int | None = None,
) -> DataFrame:
    """Generic fused scan+map: plan balanced file tasks, have each Python
    worker read its parquet splits with pyarrow (column-pruned) and stream
    record batches through ``fn(batch) -> iterator[RecordBatch]``.

    The generalization of the fused encode path to ANY vectorized operator:
    no JVM row materialization on the input side — the boundary that costs
    20-30x on payload-heavy columns (module doc above). ``fn`` must be a
    plain function (it is pickled to workers).
    """
    tasks = plan_parquet_tasks(spark, path, n_tasks)

    def run(batches):
        import pyarrow.parquet as pq

        from xml2arrow_spark.env import limit_arrow_threads

        limit_arrow_threads(1)
        for b in batches:
            path_lists = b.column(b.schema.get_field_index("path")).to_pylist()
            for fpath in (p for paths in path_lists for p in paths):
                pf = pq.ParquetFile(fpath)
                for batch in pf.iter_batches(batch_size=65536, columns=columns):
                    yield from fn(batch)

    return tasks.mapInArrow(run, output_ddl)


def map_local_files(infos, fn):
    """Evaluate ``fn(path, pyarrow.parquet)`` for every ``(path, size)`` in
    ``infos`` IN ORDER, returning the per-file results (callers merge
    sequentially, so their folds stay bit-deterministic).

    Deliberately SEQUENTIAL: an r06 ThreadPoolExecutor variant was
    measured at sf1.0/local[32] and made every metadata-aggregate local
    dispatch ~2x SLOWER (group_sum 0.63 s -> 1.63 s, count_where[str]
    0.37 s -> 1.37 s, group_aggs 1.5 s -> 2.4 s): the per-file work is
    dominated by many SMALL per-block numpy/python steps that hold the
    GIL, so threads only add contention. Kept as the single chokepoint so
    a future free-threaded/pool experiment edits one place."""
    import pyarrow.parquet as pq_local

    return [fn(fp, pq_local) for fp, _s in infos]
