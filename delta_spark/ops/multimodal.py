"""Multimodal (image/audio/video) column handling.

Pattern: media payloads are opaque `binary` columns traveling next to
typed metadata structs; decode / feature-extraction / resize /
frame-sampling run as Arrow-batched `mapInPandas` stages so each
executor processes whole record batches without per-row Python
overhead. Real codec libraries (PIL/ffmpeg/librosa) are NOT in this
environment — the decode kernels below are deterministic structural
parsers over the payload bytes (header sniff + byte statistics), with
the actual pixel/sample decode stubbed behind NotImplementedError.
The Spark-side plumbing — schema, batch shapes, partitioning, UDF
signatures — is the real, tested scale path.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("kind", T.StringType()),      # image | audio | video
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ])),
])

_MAGIC = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"RIFF": "riff",   # wav/avi container
    b"GIF8": "gif",
    b"\x00\x00\x00": "mp4ish",
}


def sniff_format(payload: bytes) -> str:
    for magic, name in _MAGIC.items():
        if payload[:len(magic)] == magic:
            return name
    return "unknown"


def decode_image(payload: bytes):
    """Pixel decode — requires an image codec library not present in
    this environment. The surrounding pipeline (batching, schema,
    feature columns) is real; swap this for PIL.Image.open at deploy."""
    raise NotImplementedError("image codec libraries unavailable; plug PIL/torchvision here")


FEATURE_SCHEMA = "media_id long, format string, n_bytes int, byte_mean double, byte_entropy_q double, header_hex string"


def extract_features(df: DataFrame, payload_col: str = "payload",
                     id_col: str = "media_id") -> DataFrame:
    """Structural feature extraction over binary payloads via
    Arrow-batched mapInPandas: format sniff, size, byte-value mean, a
    coarse entropy proxy, header fingerprint. The batch shape is the
    same one a real decoder would use."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = pdf[payload_col]
            fmts, sizes, means, ents, heads = [], [], [], [], []
            for p in payloads:
                b = bytes(p) if p is not None else b""
                arr = np.frombuffer(b, dtype=np.uint8)
                fmts.append(sniff_format(b))
                sizes.append(len(b))
                means.append(float(arr.mean()) if len(arr) else 0.0)
                if len(arr):
                    counts = np.bincount(arr, minlength=256) / len(arr)
                    nz = counts[counts > 0]
                    ents.append(float(round(-(nz * np.log2(nz)).sum(), 6)))
                else:
                    ents.append(0.0)
                heads.append(b[:8].hex())
            yield pd.DataFrame({
                "media_id": pdf[id_col],
                "format": fmts,
                "n_bytes": sizes,
                "byte_mean": [round(m, 6) for m in means],
                "byte_entropy_q": ents,
                "header_hex": heads,
            })

    return df.mapInPandas(kernel, FEATURE_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter used by tests/bench: treat document text bytes as opaque
    payloads so the multimodal plumbing is exercised on real data."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("image").alias("kind"), F.lit("raw").alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explode per-media sampling
    timestamps from metadata (duration), ready for a decode stage.
    Pure JVM expressions; the decode itself is the stubbed kernel."""
    return (df.withColumn(
        "sample_ts_ms",
        F.explode(F.sequence(F.lit(0),
                             F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
                             F.lit(every_ms))))
        .select("media_id", "sample_ts_ms"))


RESIZED_SCHEMA = ("media_id long, payload binary, width int, height int, "
                  "resized boolean")


def resize_images(df: DataFrame, width: int, height: int,
                  payload_col: str = "payload",
                  id_col: str = "media_id") -> DataFrame:
    """Image resize stage: the Spark-side plumbing (Arrow-batched
    mapInPandas, one output row per input, typed payload+dims schema)
    is real; the pixel transform itself is the documented codec stub in
    this environment. Payloads ALWAYS pass through unchanged with
    `resized=false` — never a false claim of resampled dims — and a
    real deployment replaces `kernel`'s passthrough with an actual
    decode→resample→encode (PIL/torchvision); corrupt payloads must
    stay passthrough-false rather than failing the task."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload = [bytes(p) if p is not None else b""
                           for p in pdf[payload_col]]
            yield pd.DataFrame({
                "media_id": pdf[id_col],
                "payload": out_payload,
                "width": width,
                "height": height,
                "resized": False,
            })

    return df.mapInPandas(kernel, RESIZED_SCHEMA)
