"""Training-data pipeline operators over the engine's tables.

Large-scale training pipelines need more than encode/decode: deduplication
(exact, MinHash+LSH, SimHash, n-gram Jaccard), similarity search over
embeddings, text analysis (language-ID, quality, token counts,
fingerprints), and multimodal binary plumbing. Everything here is pure
DataFrame + built-in SQL expressions (JVM-side, whole-stage codegen) except
the explicitly-stubbed multimodal decoders, which are Arrow-batched
``mapInPandas``.

Semantics are shared with the DuckDB correctness oracles through
:mod:`xml2arrow_spark.pipeline.sqlgen`: each operator's expressions are
rendered from the same dialect-neutral templates the oracle SQL is rendered
from, so Spark and the oracle agree bit-for-bit (integer arithmetic and
sequential float folds only).
"""

from xml2arrow_spark.pipeline import dedup, similarity, textstats, multimodal  # noqa: F401

__all__ = ["dedup", "similarity", "textstats", "multimodal"]
