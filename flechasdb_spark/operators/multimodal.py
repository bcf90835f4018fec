"""Multimodal column plumbing for training-data pipelines: opaque
``binary`` payload columns with typed metadata, decode / feature-extract
/ resize as Arrow-batched ``mapInPandas`` stages, and frame sampling as
pure Catalyst expressions.

Extension surface (no reference counterpart). The real decoders
(image/audio/video libraries) are NOT available in this environment, so
``decode_image(..., fake=False)`` raises ``NotImplementedError`` at the
clearly-marked integration point; the default is a deterministic fake
decode derived from the payload's md5 digest, which keeps the entire
Spark-side contract real and testable: binary schema, Arrow batch
transfer, ``mapInPandas`` iterator signature, output struct schema, and
the DuckDB oracle (md5 arithmetic is cross-engine).

Scale design (100 TB of media):
- payloads stay opaque bytes end to end — no driver collect, no
  row-at-a-time Python; Arrow moves binary columns in batches.
- decode stages are map-side only (no shuffle); output features are
  small relative to payloads, so project payloads away immediately
  after decoding (done here: decode outputs drop the payload column).
- frame sampling is pure expression work (sequence/posexplode) —
  whole-stage codegen, no Python.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "attach_payload",
    "payload_stats",
    "decode_image",
    "resize_meta",
    "sample_frames",
    "FEATURE_DIM",
]

FEATURE_DIM = 8


def attach_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Derive an opaque binary payload column (+ typed metadata struct)
    from a text column — the testdata has no media files, so payload =
    utf-8 bytes stands in; every downstream op treats it as opaque."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        id_col,
        payload.alias("payload"),
        F.struct(
            F.length(payload).cast("long").alias("n_bytes"),
            F.lit("text/utf-8").alias("format"),
        ).alias("media_meta"),
    )


def payload_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Binary metadata scan: size + content digest (pure Catalyst)."""
    return df.select(
        id_col,
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.md5("payload").alias("content_md5"),
        F.conv(F.substring(F.md5("payload"), 1, 8), 16, 10)
        .cast("long")
        .alias("digest_prefix"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for an image decoder: dimensions and a
    FEATURE_DIM-dim feature vector derived from the md5 digest."""
    h = hashlib.md5(payload).hexdigest()
    width = 32 + int(h[0:2], 16) % 224
    height = 32 + int(h[2:4], 16) % 224
    feats = [
        round(int(h[2 * j : 2 * j + 2], 16) / 255.0, 4)
        for j in range(FEATURE_DIM)
    ]
    return width, height, feats


def decode_image(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    fake: bool = True,
    batch_size_hint: int | None = None,
) -> DataFrame:
    """Decode + feature-extract over binary payloads via ``mapInPandas``
    (Arrow batches of bytes in, small feature rows out; payload column
    is dropped on output).

    ``fake=False`` is the real-decoder integration point — wire PIL /
    torchvision / ffmpeg there; unavailable in this environment.
    """
    if not fake:
        raise NotImplementedError(
            "real image decoding requires an image library (PIL/cv2) "
            "not present in this environment; use fake=True for the "
            "deterministic md5-derived stand-in"
        )

    schema = (
        f"{id_col} long, width int, height int, features array<float>"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "features": [d[2] for d in decoded],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode, schema)


def resize_meta(
    decoded: DataFrame, target_w: int, target_h: int, id_col: str = "doc_id"
) -> DataFrame:
    """Resize bookkeeping (the tensor work lives in the decoder): output
    dims + scale factors. Kept as expressions — resizing metadata never
    needs Python."""
    return decoded.select(
        id_col,
        F.lit(target_w).alias("out_width"),
        F.lit(target_h).alias("out_height"),
        F.round(F.lit(target_w) / F.col("width"), 4).alias("scale_x"),
        F.round(F.lit(target_h) / F.col("height"), 4).alias("scale_y"),
    )


def sample_frames(
    df: DataFrame,
    every_k: int = 8,
    frames_per_256b: int = 240,
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame sampling plumbing for video payloads: a deterministic
    frame count from the payload size (stand-in for container
    metadata), then every k-th frame index via ``sequence`` +
    ``posexplode`` — pure Catalyst, one output row per sampled frame."""
    n_frames = (
        F.lit(1) + F.col("media_meta.n_bytes") % frames_per_256b
    ).cast("int")
    with_frames = df.select(
        id_col,
        n_frames.alias("n_frames"),
        F.sequence(
            F.lit(0), n_frames - 1, F.lit(every_k)
        ).alias("__frames"),
    )
    return with_frames.select(
        id_col,
        F.col("n_frames").cast("long").alias("n_frames"),
        F.posexplode("__frames").alias("frame_pos", "frame_idx"),
    ).select(
        id_col,
        "n_frames",
        F.col("frame_pos").cast("long").alias("frame_pos"),
        F.col("frame_idx").cast("long").alias("frame_idx"),
    )
