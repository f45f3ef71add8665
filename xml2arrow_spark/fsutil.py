"""Driver-side filesystem helpers over the JVM Hadoop FileSystem API.

KB-scale markers and manifest bookkeeping must never be Spark write jobs
(a 128-row createDataFrame().write measured 4.6 s — repo ground rule), but
plain ``os.*`` / ``shutil`` only touch the driver's LOCAL disk, silently
doing nothing useful when the path is ``hdfs://`` / ``s3a://`` — exactly
the storage a cluster checkpoint dir lives on (r05 review finding). These
helpers go through ``org.apache.hadoop.fs.FileSystem`` via py4j: still
driver-side, still no Spark job, but correct on every Hadoop-supported
scheme including bare local paths.
"""

from __future__ import annotations

__all__ = [
    "exists",
    "mkdirs",
    "delete",
    "read_text",
    "write_text_atomic",
]


def _fs(spark, path: str):
    jvm = spark._jvm
    hp = jvm.org.apache.hadoop.fs.Path(path)
    return hp.getFileSystem(spark._jsc.hadoopConfiguration()), hp, jvm


def exists(spark, path: str) -> bool:
    fs, hp, _ = _fs(spark, path)
    return bool(fs.exists(hp))


def mkdirs(spark, path: str) -> None:
    fs, hp, _ = _fs(spark, path)
    fs.mkdirs(hp)


def delete(spark, path: str, recursive: bool = True) -> bool:
    """Delete if present; False when the path did not exist."""
    fs, hp, _ = _fs(spark, path)
    if not fs.exists(hp):
        return False
    return bool(fs.delete(hp, recursive))


def read_text(spark, path: str) -> str:
    fs, hp, jvm = _fs(spark, path)
    stream = fs.open(hp)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def write_text_atomic(spark, path: str, text: str) -> None:
    """Write-then-rename: readers see the old marker or the new one,
    never a torn write.

    The replace rides ``FileContext.rename(..., OVERWRITE)`` — an atomic
    in-place replace on local fs and HDFS, with NO window where neither
    marker exists. Where FileContext is unavailable for the scheme, falls
    back to delete+rename (a crash between the two can lose the marker —
    which degrades to a from-scratch rebuild, never corruption) and
    RAISES when the Hadoop rename reports failure (it returns false, it
    does not throw)."""
    fs, hp, jvm = _fs(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(path + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    try:
        fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
            fs.getUri(), spark._jsc.hadoopConfiguration()
        )
        gateway = spark.sparkContext._gateway
        opts = gateway.new_array(jvm.org.apache.hadoop.fs.Options.Rename, 1)
        opts[0] = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
        fc.rename(tmp, hp, opts)
        return
    except Exception:
        pass  # scheme without FileContext support -> two-step fallback
    if fs.exists(hp):
        fs.delete(hp, False)
    if not fs.rename(tmp, hp):
        raise IOError(f"atomic marker write failed: rename {path}.tmp -> {path}")
