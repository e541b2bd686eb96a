"""Multimodal (image/audio/video) column handling.

Design: media travel as opaque ``binary`` columns with a typed metadata
struct alongside (SURVEY 'multimodal columns' requirement).  Decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` — the Spark-side
plumbing (schemas, batch shapes, partitioning) is real and tested; the
actual codec step is STUBBED (this container has no image/audio libs):
``decoder="fake"`` produces deterministic synthetic pixels/samples so
pipelines can be built and tested end-to-end, and ``decoder="real"``
raises NotImplementedError at the exact point a PIL/ffmpeg call belongs.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_DTYPE = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ],
)

AUDIO_META_DTYPE = T.StructType(
    [
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("codec", T.StringType()),
    ],
)

VIDEO_META_DTYPE = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("fps", T.DoubleType()),
    ],
)


def attach_image_metadata(df: DataFrame, binary_col: str, width=None, height=None, fmt="raw"):
    """Attach a typed metadata struct next to a binary media column."""
    return df.withColumn(
        f"{binary_col}_meta",
        F.struct(
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.lit(fmt).alias("format"),
        ),
    )


def _fake_decode(data: bytes, n: int = 16) -> list:
    """Deterministic stand-in for a codec: first-n byte histogram-ish
    features derived only from the payload bytes."""
    if data is None:
        return [0.0] * n
    arr = list(data[: 4 * n]) or [0]
    out = []
    for i in range(n):
        chunk = arr[i::n] or [0]
        out.append(float(sum(chunk) % 256) / 255.0)
    return out


def image_features(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    n_features: int = 16,
    decoder: str = "fake",
) -> DataFrame:
    """Extract a fixed-size feature vector per image via Arrow-batched
    mapInPandas.  Schema: (id, features array<float>).  The decode step
    is the stub boundary."""
    if decoder not in ("fake", "real"):
        raise ValueError("decoder must be 'fake' or 'real'")
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ],
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real image decode requires PIL/opencv — not available in "
                    "this container; plug the codec call here",
                )
            feats = [_fake_decode(b, n_features) for b in pdf[binary_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, binary_col).mapInPandas(extract, schema=schema)


def frame_sample(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    every_n: int = 10,
    decoder: str = "fake",
) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame,
    (id, frame_idx, frame binary).  Fake decoder slices the payload into
    pseudo-frames; the real path raises at the codec boundary."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ],
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for _, row in pdf.iterrows():
                if decoder == "real":
                    raise NotImplementedError(
                        "real video decode requires ffmpeg — plug the demuxer here",
                    )
                data = row[binary_col] or b""
                n_pseudo_frames = max(1, len(data) // 64)
                for fi in range(0, n_pseudo_frames, every_n):
                    ids.append(row[id_col])
                    idxs.append(fi)
                    frames.append(bytes(data[fi * 64 : (fi + 1) * 64]))
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, binary_col).mapInPandas(sample, schema=schema)


def audio_features(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    n_features: int = 8,
    decoder: str = "fake",
) -> DataFrame:
    """Audio feature extraction plumbing (same contract as
    image_features)."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ],
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real audio decode requires soundfile/librosa — plug here",
                )
            feats = [_fake_decode(b, n_features) for b in pdf[binary_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, binary_col).mapInPandas(extract, schema=schema)
