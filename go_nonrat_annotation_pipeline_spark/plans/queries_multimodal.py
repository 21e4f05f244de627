"""Multimodal-column queries: binary payloads + Arrow-batched decode stub.

The decode itself is stubbed deterministically (no media libs in this
container — SURVEY.md north star), so the full Spark plumbing (binary
column → mapInPandas decode → typed metadata → frame explode) is
oracle-checkable via byte-length arithmetic.
"""

from __future__ import annotations

from ..operators import multimodal as MM
from ..sources.testdata import load_table
from .registry import register


@register(
    "mm_binary_decode",
    """
    SELECT doc_id,
           CAST(OCTET_LENGTH(ENCODE(text)) AS INTEGER) AS n_bytes,
           CAST(OCTET_LENGTH(ENCODE(text)) % 640 AS INTEGER) AS width,
           CAST((OCTET_LENGTH(ENCODE(text)) * 7) % 480 AS INTEGER) AS height,
           CAST(OCTET_LENGTH(ENCODE(text)) // 100 + 1 AS INTEGER) AS n_frames
    FROM documents
    """,
    doc="multimodal: binary column → mapInPandas decode stub → metadata",
)
def mm_binary_decode(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return MM.decode_metadata(MM.to_binary_docs(docs))


@register(
    "mm_frame_sample",
    """
    SELECT doc_id, CAST(t.frame_idx AS INTEGER) AS frame_idx,
           (t.frame_idx * 2654435761 + doc_id) % 2147483647 AS frame_fingerprint
    FROM (SELECT doc_id, OCTET_LENGTH(ENCODE(text)) // 100 + 1 AS n_frames
          FROM documents) d,
         UNNEST(GENERATE_SERIES(0, d.n_frames - 1)) AS t(frame_idx)
    """,
    doc="multimodal: per-frame explode with deterministic fingerprints",
)
def mm_frame_sample(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    meta = MM.decode_metadata(MM.to_binary_docs(docs))
    return MM.sample_frames(meta)


@register(
    "mm_resize",
    """
    WITH d AS (
      SELECT doc_id,
             OCTET_LENGTH(ENCODE(text)) % 640 + 1 AS w,
             (OCTET_LENGTH(ENCODE(text)) * 7) % 480 + 1 AS h
      FROM documents
    )
    SELECT doc_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
           CAST(w * 224 // GREATEST(w, h) AS INTEGER) AS out_width,
           CAST(h * 224 // GREATEST(w, h) AS INTEGER) AS out_height,
           224 AS scale_num, CAST(GREATEST(w, h) AS INTEGER) AS scale_den
    FROM d
    """,
    doc="multimodal: letterboxed resize stub (Arrow-batched mapInPandas)",
)
def mm_resize(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return MM.resize_images(MM.to_binary_docs(docs), 224)


# mm_feature_extract moved to queries_r4_fixes.py (round 4): the raw
# array<float> final projection crashed the driver's canonicalizer; the
# repaired form serializes the vector identically in both engines.
