"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
typed metadata struct; decode / feature-extract run as Arrow-batched
``mapInPandas`` (one Python roundtrip per *batch*, never per row). The
actual media decoders are STUBBED — the image/audio libraries are not in
this container — behind :func:`decode_media`, which raises
``NotImplementedError`` unless a decoder is injected; tests and the driver
queries use :func:`fake_decoder`, a deterministic pure-numpy stand-in, so the
Spark-side plumbing (schema, partitioning, UDF signature, batch shape) is
real and tested end-to-end.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = [
    "attach_binary_payload",
    "media_metadata",
    "decode_media",
    "fake_decoder",
    "extract_features",
    "FEATURES_DDL",
]

FEATURES_DDL = (
    "doc_id bigint, n_bytes int, byte_sum bigint, head_hash bigint, "
    "feature array<double>"
)

N_FEATURES = 8


def attach_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: utf-8 bytes of ``text_col`` as the opaque
    payload plus a typed metadata struct (what a real ingest would carry)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(payload).alias("n_bytes"),
            F.lit(0).alias("width"),
            F.lit(0).alias("height"),
        ),
    )


def media_metadata(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, mime, n_bytes) — metadata projection; never reads payloads
    beyond what the scan already materialized."""
    return docs.select(
        id_col,
        F.col("media_meta.mime").alias("mime"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
    )


def decode_media(payload: bytes, mime: str):
    """STUB: real image/audio decode (PIL/libsndfile/ffmpeg) is unavailable
    in this container. Inject a decoder into :func:`extract_features`
    instead; calling this directly is an explicit error."""
    raise NotImplementedError(
        f"media decode for {mime!r} requires image/audio libraries not "
        "present in this environment; pass decoder=fake_decoder for tests"
    )


def fake_decoder(buf: np.ndarray) -> np.ndarray:
    """Deterministic stand-in decoder: N_FEATURES moments of the byte
    stream (pure numpy, vectorized over the whole batch elsewhere)."""
    if buf.size == 0:
        return np.zeros(N_FEATURES)
    x = buf.astype(np.float64)
    return np.array(
        [
            x.mean(),
            x.std(),
            x.min(),
            x.max(),
            float(np.median(x)),
            x[:: max(len(x) // 4, 1)].sum() % 997.0,
            float(len(x) % 251),
            float((x[0] * 31 + x[-1]) % 509),
        ]
    )


def extract_features(
    docs: DataFrame,
    decoder: Callable[[np.ndarray], np.ndarray] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    Returns (doc_id, n_bytes, byte_sum, head_hash, feature). ``decoder``
    maps a uint8 buffer to an N_FEATURES float vector; None routes to the
    stubbed :func:`decode_media` (which raises — by design)."""

    use = decoder

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, sums, heads, lens = [], [], [], []
            for raw in pdf["payload"]:
                buf = np.frombuffer(raw, dtype=np.uint8)
                lens.append(len(buf))
                sums.append(int(buf.sum()))
                head = buf[:8].astype(np.int64)
                heads.append(int((head * (31 ** np.arange(head.size))).sum() % 2147483647))
                if use is None:
                    decode_media(raw, "application/octet-stream")
                feats.append(use(buf).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pd.Series(lens, dtype="int32"),
                    "byte_sum": pd.Series(sums, dtype="int64"),
                    "head_hash": pd.Series(heads, dtype="int64"),
                    "feature": feats,
                }
            )

    return docs.select(id_col, "payload").mapInPandas(fn, FEATURES_DDL)
