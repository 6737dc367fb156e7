"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with struct metadata; all
heavy per-record work runs in Arrow-batched ``mapInPandas`` (the same
kernel-isolation pattern the reference uses for NumPy/TF,
lib/dataset.py:160-198).  The decode kernels themselves are STUBBED in
this container (no image/audio libs) behind ``NotImplementedError`` or a
clearly-marked deterministic fake — the Spark-side plumbing (schema,
batching, partitioning, UDF signatures) is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_type string, width int, height int, n_frames int, "
    "sample_rate int, byte_len long"
)

def decode_image(payload: bytes):
    """Real decode requires an image library not present in this
    container; the plumbing around it is what the engine provides."""
    raise NotImplementedError(
        "image decode requires an imaging library (PIL/opencv); "
        "install one and replace this kernel — the Spark plumbing "
        "(schema/batching/partitioning) is library-agnostic"
    )


def fake_decode_features(payload: bytes, n_dims: int = 8) -> list[float]:
    """DETERMINISTIC FAKE decode standing in for a feature extractor:
    md5-derived values in [0,1).  Lets tests exercise the full Arrow
    path end-to-end without media libraries."""
    d = hashlib.md5(payload or b"").digest()
    return [d[i] / 256.0 for i in range(n_dims)]


def with_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap metadata derivable JVM-side without decoding."""
    return df.withColumn("byte_len", F.length(F.col(payload_col)).cast("long"))


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_cols: tuple = ("url", "media_idx"),
    n_dims: int = 8,
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads: real Arrow
    batch shape, fake kernel (see fake_decode_features)."""
    cols = list(id_cols) + [payload_col]
    pruned = df.select(*cols)
    out_schema = (
        ", ".join(f"{c} string" if c == "url" else f"{c} int" for c in id_cols)
        + ", feature array<float>"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                fake_decode_features(
                    bytes(p) if p is not None else b"", n_dims
                )
                for p in pdf[payload_col]
            ]
            res = pdf[list(id_cols)].copy()
            res["feature"] = feats
            yield res

    return pruned.mapInPandas(kernel, schema=out_schema)


def frame_sample_plan(
    df: DataFrame, every_n: int = 10, n_frames_col: str = "n_frames"
) -> DataFrame:
    """Video frame-sampling plumbing: expands (url, n_frames) into one row
    per sampled frame index JVM-side (sequence+explode) — the decode of
    each frame would then run in extract_features."""
    idxs = F.sequence(
        F.lit(0), F.greatest(F.col(n_frames_col) - 1, F.lit(0)), F.lit(every_n)
    )
    return df.withColumn("frame_idx", F.explode(idxs))
