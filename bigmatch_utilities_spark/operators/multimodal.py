"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
metadata struct (media_type, width/height/duration, codec). The Spark-side
contract — schema, Arrow batch shape, partition sizing — is real and
tested; the actual codec work is stubbed (``pillow``/``av`` are not in this
container) behind ``_decode_image``: a clearly-marked seam where a real
decoder plugs in. The deterministic fallback extracts a byte-histogram
feature vector so downstream operators (dedup, ANN) have honest inputs.

Scale notes: ``mapInPandas`` streams Arrow batches; `batch_rows` bounds
executor memory for fat binaries (maxRecordsPerBatch conf is the global
knob). Feature extraction is map-only — no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 32

MEDIA_SCHEMA = (
    "media_id long, media binary, media_type string, "
    "width int, height int, n_bytes long"
)


def attach_media(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Test/demo helper: wrap a text column as a binary media payload with
    metadata — the shape a real ingest (image bytes from object storage)
    would produce."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("media"),
        F.lit("application/octet-stream").alias("media_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.length(F.encode(F.col(text_col), "utf-8")).cast("long").alias("n_bytes"),
    )


def _decode_ppm(payload: bytes) -> "np.ndarray":
    """Dependency-free binary-PPM (P6, maxval <= 255) decoder → HxWx3 uint8.

    Full header grammar: magic, then width/height/maxval tokens separated
    by arbitrary whitespace, '#' comments allowed between tokens, exactly
    one whitespace byte before the raster (netpbm spec)."""
    pos = 2  # past b"P6"
    fields: list[int] = []
    n = len(payload)
    while len(fields) < 3:
        while pos < n and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < n and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < n and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # the single whitespace byte after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit-per-channel PPM is not supported")
    need = w * h * 3
    if n - pos < need:
        raise ValueError(f"PPM raster truncated: need {need}, have {n - pos}")
    raster = np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
    return raster.reshape(h, w, 3)


def _decode_image(payload: bytes) -> "np.ndarray":
    """Real decoder seam → HxWx3 uint8.

    Binary PPM (P6) decodes here dependency-free — the one uncompressed
    format the container can exercise end-to-end. Every compressed format
    (JPEG/PNG/...) needs pillow/libjpeg, absent in this environment: those
    payloads fail loudly rather than silently fake pixels.
    """
    if payload is not None and bytes(payload[:2]) == b"P6":
        return _decode_ppm(bytes(payload))
    raise NotImplementedError(
        "only binary PPM (P6) decodes without codec libraries; "
        "JPEG/PNG decoding requires pillow/libjpeg, not available here"
    )


def byte_histogram_features(
    payload: bytes, dim: int = FEATURE_DIM, normalize: bool = True
) -> np.ndarray:
    """Deterministic fallback feature: histogram of byte values bucketed
    into `dim` bins; L2-normalized by default. ``normalize=False`` returns
    the raw integer counts (exactly representable in float32 up to 2^24) —
    the oracle-checkable mode: integer counts are engine-independent, while
    the normalized values depend on the norm's summation order."""
    if payload is None or len(payload) == 0:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> int(np.log2(256 // dim)), minlength=dim).astype(
        np.float64
    )
    if not normalize:
        return hist.astype(np.float32)
    norm = np.linalg.norm(hist)
    return (hist / norm if norm > 0 else hist).astype(np.float32)


def extract_features(
    df: DataFrame,
    *,
    media_col: str = "media",
    id_col: str = "media_id",
    dim: int = FEATURE_DIM,
    use_decoder: bool = False,
    normalize: bool = True,
) -> DataFrame:
    """media → (media_id, features array<float>) via mapInPandas.

    `use_decoder=True` routes through the real-decoder seam (raises here);
    the default extracts the deterministic byte-histogram features.
    `normalize=False` yields raw integer bin counts (see
    byte_histogram_features) — the mode the DuckDB oracle twins exactly.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf[media_col]:
                if use_decoder:
                    px = _decode_image(payload)  # pragma: no cover
                    feats.append(px.mean(axis=(0, 1)).astype(np.float32))
                else:
                    feats.append(byte_histogram_features(payload, dim, normalize))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "features": [f.tolist() for f in feats],
                }
            )

    return df.select(id_col, media_col).mapInPandas(
        run, schema=f"{id_col} long, features array<float>"
    )


def image_stats(
    df: DataFrame,
    *,
    media_col: str = "media",
    id_col: str = "media_id",
) -> DataFrame:
    """Decode images and emit per-image pixel statistics:

        (media_id, width, height, mean_r, mean_g, mean_b)

    Runs THROUGH the real decoder seam (:func:`_decode_image`) inside one
    map-only ``mapInPandas`` — the end-to-end image path, not the byte
    fallback. P6 PPM payloads decode dependency-free; anything else raises
    (loud-failure contract). Channel means are exact ``sum/n`` doubles so
    an oracle computing the same arithmetic matches bit-for-bit.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, mr, mg, mb = [], [], [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[media_col]):
                px = _decode_image(payload)
                h, w, _ = px.shape
                sums = px.reshape(-1, 3).astype(np.int64).sum(axis=0)
                npx = float(h * w)
                ids.append(mid)
                ws.append(w)
                hs.append(h)
                mr.append(sums[0] / npx)
                mg.append(sums[1] / npx)
                mb.append(sums[2] / npx)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "width": ws,
                    "height": hs,
                    "mean_r": mr,
                    "mean_g": mg,
                    "mean_b": mb,
                }
            )

    return df.select(id_col, media_col).mapInPandas(
        run,
        schema=(
            f"{id_col} long, width int, height int, "
            "mean_r double, mean_g double, mean_b double"
        ),
    )


def frame_sample_plan(
    df: DataFrame, every_n: int = 10, id_col: str = "media_id"
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame index.

    The decode is stubbed; the row explosion, partitioning, and schema are
    the real contract: (media_id, frame_idx) ready for a decoder UDF."""
    n_frames = (F.col("n_bytes") / F.lit(1024)).cast("int") + 1  # stub estimate
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), n_frames, F.lit(every_n))
        ).alias("frame_idx"),
    )
