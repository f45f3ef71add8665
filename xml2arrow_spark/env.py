"""Process-environment tuning for the vectorized kernel hot path.

The encode kernels allocate multi-MB numpy temporaries per block. glibc
malloc services any allocation above ``M_MMAP_THRESHOLD`` (default 128 KB)
with a fresh ``mmap`` and returns it with ``munmap`` on free — so every
block encode round-trips pages through the kernel (zero-fill page faults on
touch, VMA churn, zone-lock contention across workers). Measured on the
32-core sandbox: raising the threshold so large temporaries stay on the
reused heap took the multi-process FOR-kernel aggregate from ~0.5 to ~5.6
BILLION tokens/s — it was the single largest bottleneck in the engine, far
ahead of memory bandwidth.

Call :func:`set_kernel_malloc_env` BEFORE the SparkSession (and therefore
the Python worker daemon) starts; workers inherit the environment. For
cluster deployments, ship the same variables with
``spark.executorEnv.MALLOC_MMAP_THRESHOLD_`` etc. —
:func:`recommended_spark_confs` returns them ready to pass to the builder.
"""

from __future__ import annotations

import os

__all__ = [
    "KERNEL_MALLOC_ENV",
    "set_kernel_malloc_env",
    "recommended_spark_confs",
    "limit_arrow_threads",
]

# 1 GiB: effectively "never mmap, never trim" for block-sized temporaries.
# Workers hold a few hundred MB of reusable heap at most (block_rows-bounded).
KERNEL_MALLOC_ENV = {
    "MALLOC_MMAP_THRESHOLD_": "1073741824",
    "MALLOC_TRIM_THRESHOLD_": "1073741824",
}


def set_kernel_malloc_env() -> None:
    """Set the malloc tuning variables in this process (inherited by local
    Spark's Python workers). No-op for keys the user already set."""
    for key, value in KERNEL_MALLOC_ENV.items():
        os.environ.setdefault(key, value)


def recommended_spark_confs() -> dict[str, str]:
    """Spark confs that propagate the malloc tuning to executor-side Python
    workers on a real cluster (local mode inherits the driver env instead)."""
    return {f"spark.executorEnv.{k}": v for k, v in KERNEL_MALLOC_ENV.items()}


def limit_arrow_threads(n: int = 1) -> None:
    """Pin pyarrow's internal thread pools inside a Spark task.

    pyarrow defaults both its CPU and IO pools to ``os.cpu_count()``; inside
    a Spark python worker that means every task spawns a machine-wide pool —
    32 tasks x 32 threads on the sandbox box — and 'single-task' baselines
    secretly use every core. One Spark task is one unit of parallelism;
    Spark supplies the fan-out. Call at the top of any mapInArrow fn that
    touches pyarrow readers/writers. Idempotent, cheap, worker-reuse-safe.
    """
    import pyarrow as pa

    if pa.cpu_count() != n:
        pa.set_cpu_count(n)
    if pa.io_thread_count() != n:
        pa.set_io_thread_count(n)
