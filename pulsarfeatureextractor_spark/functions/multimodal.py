"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries image/audio/video as opaque
``binary`` columns with typed metadata alongside; decode/resize/
frame-sample run as Arrow-batched Python over ``mapInPandas``.  The
image/audio codec libraries are NOT in this container, so the decode
kernels are stubbed (clearly marked), while everything Spark-side —
schema, batching, partition posture, UDF signatures, metadata
propagation — is real and tested:

- ``synthetic_media``        : deterministic binary table (seeded bytes
  + width/height/codec metadata) in the shape a real ingest would have.
- ``with_media_stats``       : JVM-only metadata features (byte length,
  crc32-style checksum via xxhash64, aspect ratio) — no Python.
- ``decode_and_featurize``   : mapInPandas kernel; per batch it
  validates payload length, emits a feature vector per row.  The pixel
  decode step calls ``_decode_image`` which raises NotImplementedError
  unless a decoder is injected — tests inject a deterministic fake.
- ``frame_sample``           : video-style payloads — select every k-th
  "frame" slice of the payload by offset arithmetic, no decode needed;
  returns one row per sampled frame (flatMap shape).

Scale posture: all three are pure map over scan partitions (no
shuffle); payload bytes cross the Arrow boundary once, features come
back as flat columns (prunable).
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),        # image | audio | video
    T.StructField("payload", T.BinaryType(), False),     # opaque encoded bytes
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_frames", T.IntegerType(), True),
    T.StructField("codec", T.StringType(), False),
])


def synthetic_media(
    spark: SparkSession, n_rows: int = 100, seed: int = 42
) -> DataFrame:
    """Deterministic media table: payload = sha-seeded bytes whose length
    encodes (width*height + frames) so stub kernels can validate."""
    rows = []
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    for i in range(n_rows):
        kind = kinds[i % 3]
        w = int(rng.choice([8, 16, 32]))
        h = int(rng.choice([8, 16]))
        frames = int(rng.integers(2, 6)) if kind == "video" else 1
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (
            (w * h * frames) // 32 + 1
        )
        payload = payload[: w * h * frames]
        rows.append((
            f"m_{i:06d}", kind, bytearray(payload), w, h, frames,
            {"image": "fake-png", "audio": "fake-pcm", "video": "fake-mjpeg"}[kind],
        ))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def with_media_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """JVM-only metadata features over the binary column — no Python.

    length/checksum/aspect stay in whole-stage codegen; this is the
    cheap pre-filter tier before any decode is paid.
    """
    return (
        df.withColumn("n_bytes", F.length(F.col(payload_col)))
        .withColumn("checksum", F.xxhash64(F.col(payload_col)))
        .withColumn(
            "aspect",
            F.when(
                F.col("height").isNotNull() & (F.col("height") > 0),
                F.col("width").cast("double") / F.col("height"),
            ),
        )
    )


def _decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB: pixel decode. No codec libraries in this container.

    A real deployment injects e.g. a PIL/libvips decoder via the
    ``decoder`` argument of :func:`decode_and_featurize`; calling the
    stub directly is an explicit error, never a silent fake.
    """
    raise NotImplementedError(
        "image decode requires a codec library; inject decoder=... "
        "(see decode_and_featurize)"
    )


FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.IntegerType(), False),
    T.StructField("valid", T.BooleanType(), False),
    T.StructField("mean_intensity", T.DoubleType(), True),
    T.StructField("std_intensity", T.DoubleType(), True),
])


def decode_and_featurize(
    df: DataFrame,
    decoder: "Callable[[bytes, int, int], np.ndarray] | None" = None,
    batch_hint: int = 256,
) -> DataFrame:
    """Decode + feature-extract via ``mapInPandas`` (Arrow batches).

    Per batch (a pandas frame of rows, payload as bytes objects):
    validates payload length against width*height*n_frames metadata,
    decodes via the injected ``decoder`` (defaults to the stub — raises
    if actually reached without injection), and emits per-row intensity
    moments.  Rows whose metadata fails validation come back
    ``valid=False`` with null features rather than poisoning the batch.
    """
    decode = decoder or _decode_image

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "valid": pd.Series([False] * n, index=pdf.index),
                "mean_intensity": pd.Series([None] * n, index=pdf.index, dtype="float64"),
                "std_intensity": pd.Series([None] * n, index=pdf.index, dtype="float64"),
            }
            expected = (
                pdf["width"].fillna(0) * pdf["height"].fillna(0)
                * pdf["n_frames"].fillna(1)
            ).astype(int)
            ok = out["n_bytes"].to_numpy() == expected.to_numpy()
            for i, (idx, row) in enumerate(pdf.iterrows()):
                if not ok[i]:
                    continue
                px = decode(bytes(row["payload"]), int(row["width"]), int(row["height"]))
                px = np.asarray(px, dtype=np.float64)
                out["valid"].at[idx] = True
                out["mean_intensity"].at[idx] = float(px.mean())
                out["std_intensity"].at[idx] = float(px.std())
            yield pd.DataFrame(out)

    return df.mapInPandas(kernel, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("frame_bytes", T.BinaryType(), False),
])


def frame_sample(df: DataFrame, every_k: int = 2) -> DataFrame:
    """Sample every k-th frame of video payloads by offset arithmetic.

    Pure JVM: frame j occupies payload[j*w*h : (j+1)*w*h]; substring +
    posexplode — one output row per sampled frame, no Python, no decode.
    """
    frame_sz = F.col("width") * F.col("height")
    idxs = F.filter(
        F.sequence(F.lit(0), F.col("n_frames") - 1),
        lambda j: j % every_k == F.lit(0),
    )
    # substr is 1-based; slice bounds from column arithmetic on the
    # lambda variable (expr strings can't see lambda vars)
    frames = F.transform(
        idxs,
        lambda j: F.struct(
            j.cast("int").alias("frame_idx"),
            F.col("payload").substr(
                (frame_sz * j + 1).cast("int"), frame_sz.cast("int")
            ).alias("frame_bytes"),
        ),
    )
    return (
        df.where(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("f"))
        .select("media_id", F.col("f.frame_idx").alias("frame_idx"),
                F.col("f.frame_bytes").alias("frame_bytes"))
    )
