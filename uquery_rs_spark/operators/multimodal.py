"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Beyond-reference surface (driver north star). Real pipelines carry
image/audio/video as `binary` columns with a metadata struct; decode /
feature-extraction runs as Arrow-batched pandas iterators (mapInPandas).
The container has no image/audio libraries, so the *decode* step is a
clearly-marked stub (deterministic fake or NotImplementedError), while the
Spark-side plumbing — schema, batch shape, partitioning — is real and
tested.

Scale design: mapInPandas streams Arrow batches through Python once, with
no row-wise serde; metadata-only operations (sizes, magic-byte sniffing)
stay JVM-side so Catalyst can prune the heavy binary column when it isn't
needed.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

REAL_DECODERS_AVAILABLE = False  # no PIL/ffmpeg in this container


def synthesize_binary_docs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Treat each document's UTF-8 bytes as an opaque media payload with a
    typed metadata struct — the schema a real image/audio table carries."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).alias("n_bytes"),
            F.lit("application/octet-stream").alias("mime"),
            (F.crc32(payload) % 1920).cast("int").alias("width"),
            (F.crc32(payload) % 1080).cast("int").alias("height"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "np.ndarray":
    """Stub for the real decoder (PIL/libjpeg not present).

    Raises NotImplementedError; extract_features uses the deterministic
    fake below instead.
    """
    raise NotImplementedError("image decode requires PIL/libjpeg — not in this container")


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a decoder+featurizer: a 16-bin histogram
    of byte values — stable across engines/platforms and cheap."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    return np.bincount(arr % FEATURE_DIM, minlength=FEATURE_DIM).astype(np.int64)


def extract_features(binary_docs: DataFrame) -> DataFrame:
    """payload → FEATURE_DIM histogram features via mapInPandas.

    Output: doc_id, n_bytes, features array<bigint>, feature_sum.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [_fake_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "features": [f.tolist() for f in feats],
                    "feature_sum": [int(f.sum()) for f in feats],
                }
            )

    return binary_docs.mapInPandas(
        batches, schema="doc_id long, n_bytes long, features array<long>, feature_sum long"
    )


def resize_images(binary_docs: DataFrame, max_dim: int = 256) -> DataFrame:
    """Image-resize plumbing via mapInPandas (decoder stubbed).

    A real implementation decodes payload → resample → re-encode inside
    the same Arrow-batched iterator; without PIL the payload passes
    through unchanged and only the metadata scales, keeping the schema,
    batch shape, and column flow identical to production. Output schema
    matches the input (doc_id, payload, meta).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = []
            for m in pdf["meta"]:
                w, h = int(m["width"]), int(m["height"])
                scale = min(1.0, max_dim / max(w, h, 1))
                metas.append(
                    {
                        "n_bytes": int(m["n_bytes"]),
                        "mime": m["mime"],
                        "width": int(w * scale),
                        "height": int(h * scale),
                    }
                )
            # REAL_DECODERS_AVAILABLE would re-encode payload here
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": pdf["payload"], "meta": metas}
            )

    return binary_docs.mapInPandas(
        batches,
        schema="doc_id long, payload binary, "
        "meta struct<n_bytes: long, mime: string, width: int, height: int>",
    )


def frame_sample_plan(binary_docs: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' plumbing: take every Nth byte offset as a frame
    index — the partition/batch shape of real video frame extraction,
    JVM-side (sequence + explode), binary column pruned unless needed."""
    n_frames = F.floor(F.col("meta.n_bytes") / every_n_bytes).cast("int")
    return binary_docs.select(
        "doc_id",
        F.posexplode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))).alias(
            "frame_idx", "frame_offset_unit"
        ),
    ).select("doc_id", "frame_idx", (F.col("frame_idx") * every_n_bytes).alias("byte_offset"))
