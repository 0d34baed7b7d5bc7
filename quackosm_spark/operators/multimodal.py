"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata structs; all
Spark-side mechanics — schema, partition sizing, Arrow batch shape, UDF
signatures — are real and tested. The codec step itself is stubbed (the
image/audio libraries are not available in this environment): decoding runs
through ``_decode_stub``, a deterministic fake keyed on the payload bytes, and
raises ``NotImplementedError`` when ``strict=True`` so production wiring is
explicit.

Scale notes: media rows are large and row-group-skewed — ``mapInPandas`` is
used (not a scalar UDF) so one task streams whole Arrow batches and can bound
its own memory; repartition by size-bucket before heavy codecs.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)

FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def _pil_decode(payload: bytes) -> "np.ndarray | None":
    """Real image decode via PIL when the library is importable (it is not
    baked into this container — the import is the gate, not a flag).
    Returns a float32 pixel array, or None when PIL is absent."""
    try:
        import io

        from PIL import Image
    except ImportError:
        return None
    with Image.open(io.BytesIO(payload)) as img:
        return np.asarray(img.convert("RGB"), dtype=np.float32).ravel()


def _decode_ppm(payload: bytes) -> "np.ndarray | None":
    """Real pure-numpy decode of binary PPM (P6) — no library needed.
    Returns interleaved RGB float32 (the PIL path's layout), or None when
    the payload is not P6."""
    if not payload.startswith(b"P6"):
        return None
    # header: magic, width, height, maxval — whitespace-separated with
    # optional '#' comments; pixel data starts after the single whitespace
    # byte that terminates maxval
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:  # 16-bit PPM: out of scope for the numpy fast path
        return None
    n = w * h * 3
    arr = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return arr.astype(np.float32)


def _decode_bmp(payload: bytes) -> "np.ndarray | None":
    """Real pure-numpy decode of uncompressed 24-bit BMP. Returns
    interleaved RGB float32 (rows top-down, BGR swapped), or None when
    the payload is not a plain 24-bit BI_RGB bitmap."""
    if payload[:2] != b"BM" or len(payload) < 54:
        return None
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    bottom_up, h = h > 0, abs(h)
    stride = (w * 3 + 3) // 4 * 4
    rows = [
        np.frombuffer(payload, dtype=np.uint8, count=w * 3, offset=off + r * stride)
        .reshape(w, 3)[:, ::-1]  # BGR → RGB
        for r in range(h)
    ]
    img = np.stack(rows[::-1] if bottom_up else rows)
    return img.astype(np.float32).ravel()


def _decode_stub(payload: bytes, strict: bool) -> np.ndarray:
    """payload bytes → pixel array.

    ``strict=True`` is the REAL-decode path: uncompressed formats (binary
    PPM/P6, 24-bit BI_RGB BMP) decode in pure numpy with no library at
    all; anything else goes to PIL if importable, else
    ``NotImplementedError`` (explicit production wiring, never a silent
    fake). ``strict=False`` is the deterministic fake keyed on the payload
    bytes so Spark-side plumbing tests can assert end-to-end values
    without any codec present.
    """
    if strict:
        for decode in (_decode_ppm, _decode_bmp, _pil_decode):
            try:
                pixels = decode(payload)
            except (ValueError, IndexError):
                # malformed/truncated container: not this format — fall
                # through to the next decoder (PIL raises its own errors)
                pixels = None
            if pixels is not None:
                return pixels
        raise NotImplementedError(
            "Compressed-format media codecs are not available in this "
            "environment; supply PPM/BMP payloads, install PIL (pillow), "
            "or run with strict=False."
        )
    arr = np.frombuffer(payload[:256], dtype=np.uint8).astype(np.float32)
    if arr.size == 0:
        arr = np.zeros(1, dtype=np.float32)
    return arr


def extract_image_features(
    media: DataFrame, feature_dim: int = 8, strict: bool = False
) -> DataFrame:
    """binary payload → fixed-size feature vector via ``mapInPandas``.

    Batch shape: one Arrow batch in, one out; constant memory per task."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, widths, heights = [], [], []
            for payload in pdf["payload"]:
                pixels = _decode_stub(bytes(payload), strict)
                # deterministic "embedding": histogram of the fake pixels
                hist, _ = np.histogram(pixels, bins=feature_dim, range=(0, 256))
                total = max(hist.sum(), 1)
                feats.append((hist / total).astype(np.float32).tolist())
                widths.append(int(pixels.size))
                heights.append(1)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": widths,
                    "height": heights,
                    "features": feats,
                }
            )

    # project to the two consumed columns BEFORE the boundary: Spark cannot
    # see inside the function, so an unpruned mapInPandas would ship (and
    # scan) every media column through Arrow (guide §4.1)
    return media.select("media_id", "payload").mapInPandas(
        _extract, schema=IMAGE_FEATURES_SCHEMA
    )


def sample_frames(
    media: DataFrame, every_ms: int = 1000, strict: bool = False
) -> DataFrame:
    """video rows → (media_id, frame_idx, frame) rows; fan-out inside
    ``mapInPandas`` keeps the expansion streaming (never one giant row)."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for media_id, payload, duration in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                _ = _decode_stub(bytes(payload), strict)
                n_frames = max(int(duration or 0) // every_ms, 1)
                step = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    ids.append(media_id)
                    idxs.append(i)
                    frames.append(bytes(payload[i * step : (i + 1) * step]))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return (
        media.where(F.col("kind") == "video")
        .select("media_id", "payload", "duration_ms")
        .mapInPandas(_sample, schema=FRAME_SAMPLE_SCHEMA)
    )


def resize_images(
    media: DataFrame, target_width: int = 32, target_height: int = 32,
    strict: bool = False,
) -> DataFrame:
    """Image rows → resized payloads + updated dims via ``mapInPandas``.

    The resample itself runs on the stub's pseudo-pixel array (linear
    interpolation to target_width*target_height samples — swap in a real
    codec resize in production); the Spark plumbing (schema preserved,
    payload replaced, metadata updated, Arrow batch streaming) is real."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = target_width * target_height
        for pdf in batches:
            payloads, widths, heights = [], [], []
            for payload in pdf["payload"]:
                pixels = _decode_stub(bytes(payload), strict)
                resampled = np.interp(
                    np.linspace(0, pixels.size - 1, n_out),
                    np.arange(pixels.size),
                    pixels,
                ).astype(np.uint8)
                payloads.append(resampled.tobytes())
                widths.append(target_width)
                heights.append(target_height)
            out = pdf.copy()
            out["payload"] = payloads
            out["width"] = widths
            out["height"] = heights
            yield out

    return media.where(F.col("kind") == "image").mapInPandas(
        _resize, schema=MEDIA_SCHEMA
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-Column metadata aggregation — no decode needed (the common
    'survey the corpus' query must not touch payloads)."""
    return media.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.avg(F.length("payload")).alias("avg_bytes"),
        F.max("duration_ms").alias("max_duration_ms"),
    )


def synthesize_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (seeded, no randomness)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes((i * 7 + j) % 256 for j in range(64 + (i % 5) * 32))
        rows.append(
            (
                i,
                kind,
                payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64,
                64,
                (i + 1) * 500 if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


IMAGE_CHANNEL_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_pixels", LongType()),
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
        StructField("brightness", DoubleType()),
    ]
)


def image_channel_stats(media: DataFrame, strict: bool = False) -> DataFrame:
    """Per-image RGB channel means + overall brightness through the REAL
    decode path (`strict=True`: pure-numpy PPM/BMP, PIL if present) —
    the exposure/color-cast screen of an image-corpus quality pipeline
    (uniform near-0 or near-255 brightness = black/blown frames; a
    channel mean far from the others = color cast / broken conversion).
    ``mapInPandas``, one Arrow batch in/out, constant memory per task;
    means accumulate in float64 regardless of decode dtype so the values
    are batch-order independent (engine-portability contract). Returns
    (media_id, n_pixels, mean_r, mean_g, mean_b, brightness) at 6 dp;
    with ``strict=False`` the deterministic fake pixels are treated as
    interleaved RGB, so plumbing tests get full value checks with no
    codec present.
    """

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, npix, mr, mg, mb, br = [], [], [], [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                arr = _decode_stub(bytes(payload), strict)
                n = arr.size - arr.size % 3
                rgb = arr[:n].reshape(-1, 3)
                ids.append(media_id)
                npix.append(len(rgb))
                if len(rgb):
                    means = rgb.mean(axis=0, dtype=np.float64)
                    mr.append(round(float(means[0]), 6))
                    mg.append(round(float(means[1]), 6))
                    mb.append(round(float(means[2]), 6))
                    br.append(round(float(rgb.mean(dtype=np.float64)), 6))
                else:
                    mr.append(None), mg.append(None), mb.append(None)
                    br.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "n_pixels": pd.Series(npix, dtype="int64"),
                    "mean_r": pd.Series(mr, dtype="float64"),
                    "mean_g": pd.Series(mg, dtype="float64"),
                    "mean_b": pd.Series(mb, dtype="float64"),
                    "brightness": pd.Series(br, dtype="float64"),
                }
            )

    return (
        media.where(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(_stats, schema=IMAGE_CHANNEL_STATS_SCHEMA)
    )


def synthesize_solid_images(spark, n: int = 64) -> DataFrame:
    """Deterministic REAL-format image table: solid-color binary PPM (P6)
    for even ids, solid-color bottom-up 24-bit BMP (with the format's
    4-byte row padding) for odd ids — arithmetic colors/sizes so an
    oracle can compute every channel mean in closed form, exercising the
    real header parse / offset / stride / BGR-swap decode paths, not a
    fake. r=(id·37)%256, g=(id·59)%256, b=(id·83)%256,
    w=4+id%3, h=3+id%2."""
    rows = []
    for i in range(n):
        r, g, b = (i * 37) % 256, (i * 59) % 256, (i * 83) % 256
        w, h = 4 + i % 3, 3 + i % 2
        if i % 2 == 0:
            payload = (f"P6\n{w} {h}\n255\n".encode()
                       + bytes([r, g, b]) * (w * h))
            mime = "image/x-portable-pixmap"
        else:
            stride = (w * 3 + 3) // 4 * 4
            row = (bytes([b, g, r]) * w).ljust(stride, b"\x00")  # BGR + pad
            header = (
                b"BM" + (54 + stride * h).to_bytes(4, "little")
                + b"\x00\x00\x00\x00" + (54).to_bytes(4, "little")
                + (40).to_bytes(4, "little")
                + w.to_bytes(4, "little") + h.to_bytes(4, "little")
                + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
                + (0).to_bytes(4, "little") + (stride * h).to_bytes(4, "little")
                + b"\x00" * 16
            )
            payload = header + row * h
            mime = "image/bmp"
        rows.append((i, "image", payload, mime, w, h, None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
