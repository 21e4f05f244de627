"""Multimodal column operators (north-star extensions).

Images/audio/video are opaque `binary` columns with typed metadata.
The Spark-side plumbing is real — binary columns, Arrow-batched
mapInPandas with explicit output schemas, partition-parallel — while the
actual media decode is STUBBED deterministically (the decode libraries
are not in this container): `decode_stub=True` derives metadata from the
byte stream itself; `decode_stub=False` raises NotImplementedError where
a real libjpeg/ffmpeg call would go.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id long, n_bytes int, width int, height int, n_frames int"
)


def to_binary_docs(docs: DataFrame, id_col: str = "doc_id", payload_col: str = "text") -> DataFrame:
    """Model a media table: (id, media binary). Real pipelines read the
    bytes from parquet/object storage; here the payload is encoded text."""
    return docs.select(
        F.col(id_col), F.encode(F.col(payload_col), "UTF-8").alias("media")
    )


def decode_metadata(media_df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Arrow-batched 'decode': binary column → typed metadata columns.

    mapInPandas so each Arrow batch is decoded in one vectorized pass —
    the exact shape a real image/audio decoder plugs into (swap the stub
    body for PIL/ffmpeg; schema, batching and partitioning are unchanged).
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires image/audio libs not present "
                    "in this environment; run with decode_stub=True"
                )
            n_bytes = pdf["media"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "width": n_bytes % 640,
                    "height": (n_bytes * 7) % 480,
                    "n_frames": n_bytes // 100 + 1,
                }
            )

    return media_df.mapInPandas(decode, schema=DECODE_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, width int, height int, out_width int, out_height int, "
    "scale_num int, scale_den int"
)


def resize_images(
    media_df: DataFrame, target: int = 224, decode_stub: bool = True
) -> DataFrame:
    """Arrow-batched 'resize': binary media → target-bounded dimensions.

    Real pipelines decode + resample pixels here (PIL/opencv); the stub
    derives source dims from the byte stream (same rule as
    decode_metadata) and computes the letterboxed output size with exact
    integer arithmetic (scale = target / max(w, h), kept as a ratio so
    the oracle can reproduce it without float divergence).
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real resize requires image libs not present in this "
                    "environment; run with decode_stub=True"
                )
            n = pdf["media"].map(len)
            w = (n % 640).astype("int64") + 1
            h = ((n * 7) % 480).astype("int64") + 1
            longest = w.where(w >= h, h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w,
                    "height": h,
                    "out_width": (w * target) // longest,
                    "out_height": (h * target) // longest,
                    "scale_num": target,
                    "scale_den": longest,
                }
            )

    return media_df.mapInPandas(resize, schema=RESIZE_SCHEMA)


N_FEATURES = 8
FEATURES_SCHEMA = "doc_id long, features array<float>"


def extract_features(media_df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Arrow-batched 'feature extraction': binary media → embedding.

    The real implementation runs a vision/audio encoder per Arrow batch
    (exactly this mapInPandas shape, batched for GPU amortization); the
    stub emits a deterministic byte-statistics vector so the pipeline —
    schema array<float>, batch iteration, downstream ANN compatibility —
    is fully testable.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real feature extraction requires encoder libs not present "
                    "in this environment; run with decode_stub=True"
                )
            n = pdf["media"].map(len)
            feats = [
                [float((b * (i + 1)) % 97) / 97.0 for i in range(N_FEATURES)]
                for b in n
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return media_df.mapInPandas(extract, schema=FEATURES_SCHEMA)


def sample_frames(meta_df: DataFrame, fp_mult: int = 2654435761, fp_mod: int = 2_147_483_647) -> DataFrame:
    """Frame sampling: one row per (doc, frame_idx) with a deterministic
    per-frame fingerprint — the explode pattern a video pipeline uses."""
    frames = F.sequence(F.lit(0), F.col("n_frames") - 1)
    out = meta_df.select(
        "doc_id", "n_frames", F.explode(frames).alias("frame_idx")
    )
    fp = (F.col("frame_idx") * F.lit(fp_mult) + F.col("doc_id")) % F.lit(fp_mod)
    return out.select("doc_id", "frame_idx", fp.alias("frame_fingerprint"))
