"""xml2arrow_spark — a PySpark-native per-column lightweight-compression engine.

A from-scratch re-expression of the *ideas* of mluttikh/xml2arrow
(/root/reference, Rust) on Spark:

- the reference's validated YAML config driving per-field typed Arrow output
  (reference src/config.rs:126-133, src/config.rs:360-382) becomes a
  **codec-selection manifest** driving per-column encode
  (:mod:`xml2arrow_spark.manifest`);
- its typed-builder append stage (reference src/xml_parser.rs:41-90) becomes
  vectorized numpy/Arrow **codec kernels** (:mod:`xml2arrow_spark.codecs`);
- its compile-once ``Parser`` (reference src/xml_parser.rs:763-784) becomes a
  driver-side planner + broadcast resolved manifest
  (:mod:`xml2arrow_spark.plans`);
- its round-trip RecordBatch equality tests (reference
  src/xml_parser.rs:1405-5868) become bit-identical ``array<int32>``
  round-trip verification (:mod:`xml2arrow_spark.operators.verify`).

Nothing here is a port: the execution engine is Spark DataFrames +
``mapInArrow`` vectorized kernels.
"""

__version__ = "0.1.0"

from xml2arrow_spark.manifest import CodecManifest, ColumnPolicy

__all__ = ["CodecManifest", "ColumnPolicy", "__version__"]
