"""Multimodal operators: runtime codec detection and the decode/resize
batch kernels. The container ships no image libs, so the REAL paths are
exercised with an injected fake codec against the pure-pandas kernels
(the same functions the mapInPandas UDFs call executor-side); the stub
paths are covered end-to-end through Spark by the registry queries."""

from __future__ import annotations

import io

import pandas as pd
import pytest

from go_nonrat_annotation_pipeline_spark.operators import multimodal as MM


class _FakeImage:
    """Minimal stand-in for PIL.Image.Image: 4-byte header encodes
    (width, height); n_frames present only when a 5th byte exists."""

    def __init__(self, buf: bytes):
        self.size = (buf[0] * 256 + buf[1], buf[2] * 256 + buf[3])
        if len(buf) > 4:
            self.n_frames = buf[4]


class _FakeCodec:
    @staticmethod
    def open(fp: io.BytesIO) -> _FakeImage:
        return _FakeImage(fp.read())


def _media_pdf():
    return pd.DataFrame(
        {
            "doc_id": [1, 2],
            "media": [
                bytes([0, 100, 0, 50]),          # 100×50, single frame
                bytes([1, 0, 0, 200, 7]),        # 256×200, 7 frames
            ],
        }
    )


def test_image_codec_absent_in_this_container():
    # the probe itself: no Pillow here, so detection returns None and
    # decode_stub=False raises with the actionable message
    assert MM.image_codec() is None
    with pytest.raises(NotImplementedError, match="decode_stub=True"):
        MM._decode_batch(_media_pdf(), decode_stub=False)
    with pytest.raises(NotImplementedError, match="decode_stub=True"):
        MM._resize_batch(_media_pdf(), 224, decode_stub=False)


def test_real_decode_activates_with_injected_codec():
    out = MM._decode_batch(_media_pdf(), decode_stub=False, codec=_FakeCodec)
    rows = {r.doc_id: r for r in out.itertuples()}
    assert (rows[1].width, rows[1].height, rows[1].n_frames) == (100, 50, 1)
    assert (rows[2].width, rows[2].height, rows[2].n_frames) == (256, 200, 7)
    assert rows[1].n_bytes == 4 and rows[2].n_bytes == 5


def test_real_resize_letterbox_arithmetic_with_injected_codec():
    out = MM._resize_batch(
        _media_pdf(), 224, decode_stub=False, codec=_FakeCodec
    )
    rows = {r.doc_id: r for r in out.itertuples()}
    # 100×50: longest=100 → out = (224, 50*224//100=112)
    assert (rows[1].out_width, rows[1].out_height) == (224, 112)
    assert (rows[1].scale_num, rows[1].scale_den) == (224, 100)
    # 256×200: longest=256 → out = (224, 200*224//256=175)
    assert (rows[2].out_width, rows[2].out_height) == (224, 175)


def test_stub_kernels_match_spark_path(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "a longer document body here")],
        "doc_id long, text string",
    )
    media = MM.to_binary_docs(docs)
    got = {
        r.doc_id: (r.n_bytes, r.width, r.height, r.n_frames)
        for r in MM.decode_metadata(media).collect()
    }
    pdf = media.toPandas()
    want_df = MM._decode_batch(pdf, decode_stub=True)
    want = {
        int(r.doc_id): (int(r.n_bytes), int(r.width), int(r.height), int(r.n_frames))
        for r in want_df.itertuples()
    }
    assert got == want
