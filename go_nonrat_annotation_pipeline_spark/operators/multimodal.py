"""Multimodal column operators (north-star extensions).

Images/audio/video are opaque `binary` columns with typed metadata.
The Spark-side plumbing is real — binary columns, Arrow-batched
mapInPandas with explicit output schemas, partition-parallel — while the
actual media decode is STUBBED deterministically when the decode
libraries are absent (this container has none): `decode_stub=True`
derives metadata from the byte stream itself; `decode_stub=False`
RUNTIME-DETECTS a codec (Pillow) and decodes for real when one is
importable, raising NotImplementedError only when it isn't. The
per-batch kernels are plain pandas functions so the real-codec path is
unit-testable with an injected fake codec without shipping one to the
executors (tests/test_multimodal.py).
"""

from __future__ import annotations

import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id long, n_bytes int, width int, height int, n_frames int"
)


def image_codec():
    """Runtime codec detection: Pillow's Image module when importable
    (evaluated on each executor at first batch — workers that have the
    lib decode for real), else None (callers fall back to the stub or
    raise, per their decode_stub flag)."""
    try:
        from PIL import Image  # noqa: PLC0415 — probe is the point

        return Image
    except Exception:
        return None


def _decode_batch(pdf: pd.DataFrame, decode_stub: bool, codec=None) -> pd.DataFrame:
    """Per-Arrow-batch decode kernel (pure pandas, executor-side)."""
    n_bytes = pdf["media"].map(len)
    if decode_stub:
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes,
                "width": n_bytes % 640,
                "height": (n_bytes * 7) % 480,
                "n_frames": n_bytes // 100 + 1,
            }
        )
    codec = codec if codec is not None else image_codec()
    if codec is None:
        raise NotImplementedError(
            "real media decode requires an image codec (Pillow) that is "
            "not importable in this environment; run with "
            "decode_stub=True"
        )
    ws, hs, fs = [], [], []
    for buf in pdf["media"]:
        im = codec.open(io.BytesIO(buf))
        w, h = im.size
        ws.append(w)
        hs.append(h)
        fs.append(int(getattr(im, "n_frames", 1)))
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "n_bytes": n_bytes,
            "width": ws,
            "height": hs,
            "n_frames": fs,
        }
    )


def to_binary_docs(docs: DataFrame, id_col: str = "doc_id", payload_col: str = "text") -> DataFrame:
    """Model a media table: (id, media binary). Real pipelines read the
    bytes from parquet/object storage; here the payload is encoded text."""
    return docs.select(
        F.col(id_col), F.encode(F.col(payload_col), "UTF-8").alias("media")
    )


def decode_metadata(media_df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Arrow-batched 'decode': binary column → typed metadata columns.

    mapInPandas so each Arrow batch is decoded in one vectorized pass.
    With decode_stub=False the codec is runtime-detected PER EXECUTOR
    (image_codec()): environments that ship Pillow decode for real with
    no code change; environments without it raise with a clear message.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        codec = None if decode_stub else image_codec()
        for pdf in batches:
            yield _decode_batch(pdf, decode_stub, codec)

    return media_df.mapInPandas(decode, schema=DECODE_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, width int, height int, out_width int, out_height int, "
    "scale_num int, scale_den int"
)


def resize_images(
    media_df: DataFrame, target: int = 224, decode_stub: bool = True
) -> DataFrame:
    """Arrow-batched 'resize': binary media → target-bounded dimensions.

    Real pipelines decode + resample pixels here; with
    decode_stub=False the source dimensions come from the
    runtime-detected codec (image_codec()) and the same exact-integer
    letterbox arithmetic applies (scale = target / max(w, h), kept as a
    ratio so the oracle can reproduce it without float divergence). The
    stub derives source dims from the byte stream (same rule as
    decode_metadata).
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        codec = None if decode_stub else image_codec()
        for pdf in batches:
            yield _resize_batch(pdf, target, decode_stub, codec)

    return media_df.mapInPandas(resize, schema=RESIZE_SCHEMA)


def _resize_batch(
    pdf: pd.DataFrame, target: int, decode_stub: bool, codec=None
) -> pd.DataFrame:
    """Per-Arrow-batch resize kernel (pure pandas, executor-side)."""
    if decode_stub:
        n = pdf["media"].map(len)
        w = (n % 640).astype("int64") + 1
        h = ((n * 7) % 480).astype("int64") + 1
    else:
        codec = codec if codec is not None else image_codec()
        if codec is None:
            raise NotImplementedError(
                "real resize requires an image codec (Pillow) that is "
                "not importable in this environment; run with "
                "decode_stub=True"
            )
        dims = [codec.open(io.BytesIO(buf)).size for buf in pdf["media"]]
        w = pd.Series([d[0] for d in dims], index=pdf.index, dtype="int64")
        h = pd.Series([d[1] for d in dims], index=pdf.index, dtype="int64")
    longest = w.where(w >= h, h)
    return pd.DataFrame(
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
                # unlike decode/resize there is no light-weight codec to
                # runtime-detect — a real encoder (torch/onnx vision
                # model) plugs in here; until one ships, only the stub
                # path runs
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
