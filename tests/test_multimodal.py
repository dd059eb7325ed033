"""Multimodal decode seam: the Arrow plumbing must be identical for the
deterministic fake decoder (oracle path) and the Pillow decoder
(production path, env-gated — auto-enabled when PIL is importable)."""

import pyspark.sql.functions as F
import pytest

from big_data_analytics_project_spark.operators import multimodal as M


def _payload_df(spark, payloads):
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "doc_id long, payload binary",
    )
    return df


def test_default_decoder_is_the_deterministic_fake(spark):
    payloads = [b"abc", b"x" * 100, b"y" * 1000]
    out = {
        r.doc_id: (r.width, r.height, r.n_pixels)
        for r in M.decode_media_meta(_payload_df(spark, payloads)).collect()
    }
    for i, p in enumerate(payloads):
        w, h = M._fake_decode(p)
        assert out[i] == (w, h, w * h)


@pytest.mark.skipif(M.HAS_PIL, reason="Pillow present: seam is live")
def test_real_decode_raises_cleanly_without_pil():
    with pytest.raises(NotImplementedError, match="PIL/Pillow"):
        M.real_decode_image(b"\x89PNG\r\n\x1a\n")


@pytest.mark.skipif(not M.HAS_PIL, reason="Pillow absent from container")
def test_real_decode_through_arrow_plumbing(spark):
    """With Pillow importable the SAME mapInPandas plumbing decodes true
    pixel dimensions — only the decoder callable changes."""
    from io import BytesIO

    from PIL import Image

    def png(w, h):
        buf = BytesIO()
        Image.new("RGB", (w, h)).save(buf, format="PNG")
        return buf.getvalue()

    sizes = [(3, 5), (16, 9), (640, 480)]
    df = _payload_df(spark, [png(w, h) for w, h in sizes])
    out = M.decode_media_meta(df, decoder=M.real_decode_image)
    got = {
        r.doc_id: (r.width, r.height, r.n_pixels)
        for r in out.orderBy("doc_id").collect()
    }
    for i, (w, h) in enumerate(sizes):
        assert got[i] == (w, h, w * h)
    # byte_len is the encoded size, not the pixel count
    assert all(r.byte_len > 0 for r in out.collect())


def test_frame_index_covers_payload_exactly(spark):
    payloads = [b"z" * 130, b"q" * 64, b"w" * 1]
    out = M.frame_index(_payload_df(spark, payloads), "doc_id", frame_bytes=64)
    per_doc = (
        out.groupBy("doc_id")
        .agg(
            F.sum("frame_len").alias("covered"),
            F.max("byte_len").alias("byte_len"),
            F.count("*").alias("n_frames"),
        )
        .collect()
    )
    for r in per_doc:
        assert r.covered == r.byte_len
    assert {r.doc_id: r.n_frames for r in per_doc} == {0: 3, 1: 1, 2: 1}
