"""Multimodal columns: binary payloads + typed metadata over DataFrames.

The reference's only media touchpoint is an image-URL string column
(Person.image, get_insert.py:101). A training-data pipeline needs the
real thing: opaque ``binary`` payload columns with typed metadata
structs, decoded / feature-extracted / resized via Arrow-batched Pandas
UDFs (``mapInPandas``) so the Python stage streams batches instead of
rows.

The *decode kernels* are stubs (image/audio codec libraries are not
available in this environment — a production deployment drops
``_decode_image_batch``'s body onto PIL/libvips and nothing else
changes). Everything Spark-side is real and tested: schemas, batch
iteration, partition sizing, output contracts.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed payload-metadata contract: every media row carries its modality,
# declared format, and byte size — filterable without touching payloads.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("format", T.StringType()),  # png | wav | mp4 | ...
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("decoded", T.BooleanType()),
    ]
)


def attach_payload_stats(media: DataFrame) -> DataFrame:
    """Cheap JVM-side metadata pass: byte length, format sanity flags —
    no Python, no payload movement beyond the scan."""
    return media.select(
        "media_id",
        "modality",
        "format",
        F.length("payload").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


def _decode_image_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Decode kernel STUB — deterministic fake standing in for a codec.

    Production: replace the body with PIL/libvips decode; the signature
    (pandas in → pandas out) and the surrounding mapInPandas plumbing
    are the real, stable interface.
    """
    import hashlib

    payloads = pdf["payload"]
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"],
            "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
            # fake decode: metadata passthrough marks the plumbing path
            "width": pdf["meta"].map(lambda m: m["width"] if m else None),
            "height": pdf["meta"].map(lambda m: m["height"] if m else None),
            "checksum": payloads.map(
                lambda b: hashlib.md5(b).hexdigest() if b is not None else None
            ),
            "decoded": payloads.map(lambda b: b is not None),
        }
    )


def extract_image_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature pass over image rows.

    Filter (modality, format) BEFORE the Python stage so only image
    payload bytes cross the JVM↔Arrow boundary; at 100 TB repartition
    first so each Python worker sees even byte volume, not even row
    counts.
    """
    images = media.filter(F.col("modality") == "image")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_image_batch(pdf)

    return images.mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("bytes_per_ms", T.DoubleType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Audio twin of the image path: Arrow-batched feature kernel over
    audio rows (decode STUB — production drops in soundfile/ffmpeg;
    the mapInPandas plumbing, schema, and modality pre-filter are the
    stable surface)."""
    import hashlib

    audio = media.filter(F.col("modality") == "audio")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dur = pdf["meta"].map(lambda m: m["duration_ms"] if m else 0)
            nbytes = pdf["payload"].map(lambda b: len(b) if b is not None else 0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": nbytes,
                    "duration_ms": dur,
                    "bytes_per_ms": nbytes / dur.replace(0, 1),
                    "checksum": pdf["payload"].map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                }
            )

    return audio.mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled timestamp.

    The timestamp lattice is computed JVM-side (sequence over
    duration_ms); only the per-frame decode would be Python. With the
    codec stubbed, the output carries (media_id, frame_ts_ms) — the
    exact partition/explode shape the real kernel plugs into.
    """
    videos = media.filter(F.col("modality") == "video")
    return videos.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def image_features_query(spark, sf_dir: str) -> DataFrame:
    """Driver-facing multimodal query: Arrow-batched feature extraction
    over the deterministic synthetic media table (rows-only check — the
    media table is generated, not stored, so there is no SQL twin)."""
    return extract_image_features(synthetic_media(spark, n=96)).orderBy("media_id")


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fixture media table (payload = repeated id bytes)."""
    rows = []
    for i in range(n):
        modality = ("image", "audio", "video")[i % 3]
        payload = bytes([i % 256]) * (128 + i)
        rows.append(
            (
                i,
                modality,
                {"image": "png", "audio": "wav", "video": "mp4"}[modality],
                payload,
                (64 + i, 48 + i, 1000 * (1 + i % 5)),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
