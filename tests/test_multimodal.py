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
    _decode_image,
)


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
        _decode_image(b"\xff\xd8\xff")


def test_decoder_path_fails_loudly(spark):
    m = _media(spark)
    with pytest.raises(Exception):  # PythonException wrapping NotImplementedError
        extract_features(m, use_decoder=True).collect()


def test_frame_sample_plan(spark):
    m = _media(spark)
    plan = frame_sample_plan(m, every_n=1)
    rows = plan.collect()
    assert {r["media_id"] for r in rows} == {1, 2, 3}
    assert all(r["frame_idx"] >= 0 for r in rows)
