"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The decode/resize/feature kernels need codecs not present in this container,
so the kernel bodies are STUBS (deterministic fakes clearly marked); the
Spark-side plumbing — schema, Arrow batch shape, mapInPandas signature,
partition sizing — is real and tested. Swap ``_decode_image_stub`` for a
PIL/OpenCV call in production; nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, mime string, width int, height int, duration_ms int"
)

FEATURE_SCHEMA = "media_id string, kind string, n_bytes int, feature array<float>"


def synth_media(spark, n: int) -> DataFrame:
    """Deterministic fake media table: payload = repeatable bytes from the id."""
    df = spark.range(0, n)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64("id", F.lit(31)), F.lit(3)) + 1).cast("int"),
    )
    payload = F.sha2(F.concat(F.lit("payload"), F.col("id").cast("string")), 256).cast("binary")
    return df.select(
        F.format_string("media_%06d", "id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (F.pmod(F.xxhash64("id", F.lit(32)), F.lit(1920)) + 1).cast("int").alias("width"),
        (F.pmod(F.xxhash64("id", F.lit(33)), F.lit(1080)) + 1).cast("int").alias("height"),
        (F.pmod(F.xxhash64("id", F.lit(34)), F.lit(60000)) + 1).cast("int").alias("duration_ms"),
    )


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB — deterministic fake 'decoded pixels' derived from the payload.

    Production: ``PIL.Image.open(io.BytesIO(payload))``. Raising
    NotImplementedError here would be honest too, but a deterministic fake
    lets the batch plumbing be exercised end-to-end in tests.
    """
    arr = np.frombuffer(payload[:16], dtype=np.uint8).astype(np.float32)
    return arr / 255.0


def extract_features(df: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (Arrow-batched).

    The real pattern for image/audio featurization at scale: iterator-of-
    batches so model/codec init happens once per task, payloads never touch
    the driver, and output is a typed array<float> column.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads (corrupt ingest) propagate as NULL n_bytes/feature
            # — SQL octet_length semantics; without the guard Arrow hands the
            # null cell to Python as None and len(None)/None[:16] kills the
            # task (round-6 review fix, pinned in test_multimodal_null_payload)
            feats = [
                None if p is None else _decode_image_stub(p).tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"]
                    .map(lambda p: None if p is None else len(p))
                    .astype("Int32"),
                    "feature": feats,
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(extract, FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "media_id string, out_width int, out_height int, scale_x double, scale_y double, pixels array<float>"
)


def _resize_stub(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """STUB — deterministic fake 'resize': nearest-neighbor index mapping
    over the fake decoded vector, which is exactly what a real
    nearest-neighbor resize does per axis. Production: PIL's
    ``Image.resize((out_w, out_h))`` on the real decoded image; the Arrow
    batch shape and output schema do not change."""
    if len(pixels) == 0:
        # zero-byte payload decodes to nothing; resize of nothing is nothing
        # (clip(0, -1) below would index -1 into an empty array and kill the
        # task — round-6 review fix, pinned in test_resize_media_lane)
        return pixels
    n = max(1, min(len(pixels), out_w))
    idx = (np.arange(n) * len(pixels) // n).clip(0, len(pixels) - 1)
    return pixels[idx]


def resize_media(df: DataFrame, out_w: int = 224, out_h: int = 224, batch_size_hint: int = 256) -> DataFrame:
    """mapInPandas resize lane over image rows (Arrow-batched) — the
    standard vision-pipeline preprocess step (decode -> resize to the model
    input size). Same iterator-of-batches shape as ``extract_features``:
    codec/model init once per task, payloads never on the driver, typed
    output columns. The decode+resize KERNELS are declared stubs (no
    codecs in this container — see module docstring); the per-row scale
    factors are computed JVM-side from the metadata columns, so the plan
    keeps the Python lane to the payload bytes only."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payload -> NULL pixels (same guard as extract_features)
            out = [
                None
                if p is None
                else _resize_stub(_decode_image_stub(p), out_w, out_h).tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_width": np.int32(out_w),
                    "out_height": np.int32(out_h),
                    "scale_x": pdf["scale_x"],
                    "scale_y": pdf["scale_y"],
                    "pixels": out,
                }
            )

    # zero/null dimensions (corrupt headers) must yield a NULL scale, not an
    # ANSI DIVIDE_BY_ZERO that fails the whole preprocess job (round-6
    # review fix)
    def scale(out: int, dim: str):
        return F.when(F.col(dim) > 0, F.lit(out) / F.col(dim))

    imgs = df.filter(F.col("kind") == "image").select(
        "media_id",
        "payload",
        scale(out_w, "width").alias("scale_x"),
        scale(out_h, "height").alias("scale_y"),
    )
    return imgs.mapInPandas(resize, RESIZE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one row per planned frame timestamp.

    The decode itself is the stubbed kernel; the row fan-out (explode over a
    sequence of timestamps) is the real Spark-side shape.
    """
    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))).alias("frame_ts_ms"),
    )
