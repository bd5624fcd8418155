"""Multimodal plumbing tests: binary columns, Arrow batch feature
extraction, stubbed decoder seam, frame-sample plan."""

from __future__ import annotations

import numpy as np
import pytest

from bigmatch_utilities_spark.operators.multimodal import (
    attach_media,
    byte_histogram_features,
    extract_features,
    frame_sample_plan,
    image_stats,
    _decode_image,
)


def _ppm(w: int, h: int, pixel) -> bytes:
    """Build a P6 payload; pixel(x, y) -> (r, g, b)."""
    body = bytearray()
    for y in range(h):
        for x in range(w):
            body.extend(pixel(x, y))
    return b"P6\n%d %d\n255\n" % (w, h) + bytes(body)


def _media(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "zzzzzzzz")],
        ["doc_id", "text"],
    )
    return attach_media(docs, "text", "doc_id")


def test_attach_media_schema(spark):
    m = _media(spark)
    assert dict(m.dtypes)["media"] == "binary"
    rows = {r["media_id"]: r for r in m.collect()}
    assert bytes(rows[1]["media"]) == b"hello world"
    assert rows[1]["n_bytes"] == 11


def test_extract_features_deterministic(spark):
    m = _media(spark)
    feats = {r["media_id"]: r["features"] for r in extract_features(m).collect()}
    assert len(feats[1]) == 32
    assert feats[1] == feats[2]  # identical payloads → identical features
    assert feats[1] != feats[3]
    want = byte_histogram_features(b"hello world")
    np.testing.assert_allclose(feats[1], want, rtol=1e-6)
    # L2 normalized
    assert abs(float(np.linalg.norm(feats[1])) - 1.0) < 1e-5


def test_decoder_seam_raises():
    with pytest.raises(NotImplementedError):
        _decode_image(b"\xff\xd8\xff")  # JPEG magic: still a loud failure


def test_decoder_path_fails_loudly(spark):
    m = _media(spark)
    with pytest.raises(Exception):  # PythonException wrapping NotImplementedError
        extract_features(m, use_decoder=True).collect()


def test_ppm_decode_roundtrip():
    px = _decode_image(_ppm(3, 2, lambda x, y: (x, y, x + y)))
    assert px.shape == (2, 3, 3)
    assert px[1, 2].tolist() == [2, 1, 3]  # row-major raster, RGB channels
    assert px.dtype == np.uint8


def test_ppm_header_grammar():
    # comments between tokens + multi-whitespace separators (netpbm spec)
    payload = b"P6\n# a comment\n 2\t1 # trailing\n255\n" + bytes(
        [10, 20, 30, 40, 50, 60]
    )
    px = _decode_image(payload)
    assert px.shape == (1, 2, 3)
    assert px[0, 1].tolist() == [40, 50, 60]


def test_ppm_loud_failures():
    with pytest.raises(ValueError, match="truncated"):
        _decode_image(b"P6\n2 2\n255\nxx")  # raster too short
    with pytest.raises(NotImplementedError, match="16-bit"):
        _decode_image(b"P6\n1 1\n65535\n\x00\x01\x00\x01\x00\x01")


def test_image_stats_end_to_end(spark):
    imgs = [
        (1, _ppm(4, 2, lambda x, y: (255, 0, 128))),   # constant channels
        (2, _ppm(2, 2, lambda x, y: (x * 10, y * 10, 7))),
    ]
    df = spark.createDataFrame(imgs, "media_id long, media binary")
    out = {r["media_id"]: r for r in image_stats(df).collect()}
    r1 = out[1]
    assert (r1["width"], r1["height"]) == (4, 2)
    assert (r1["mean_r"], r1["mean_g"], r1["mean_b"]) == (255.0, 0.0, 128.0)
    r2 = out[2]
    assert (r2["width"], r2["height"]) == (2, 2)
    assert r2["mean_r"] == 5.0 and r2["mean_g"] == 5.0 and r2["mean_b"] == 7.0


def test_frame_sample_plan(spark):
    m = _media(spark)
    plan = frame_sample_plan(m, every_n=1)
    rows = plan.collect()
    assert {r["media_id"] for r in rows} == {1, 2, 3}
    assert all(r["frame_idx"] >= 0 for r in rows)
