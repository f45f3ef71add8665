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
    never a torn write (rename is atomic on local fs and HDFS; on S3A it
    is copy+delete — still never torn, just not instantaneous)."""
    fs, hp, jvm = _fs(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(path + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    if fs.exists(hp):
        fs.delete(hp, False)
    fs.rename(tmp, hp)
