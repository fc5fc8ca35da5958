"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schemas, Arrow-batched mapInPandas
decode/transform stages, partition sizing — while the codec step is a
clearly-marked stub (`decode_stub=True` → deterministic fake features;
`decode_stub=False` → NotImplementedError), because no image/audio libraries
exist in this container. A deployment swaps `_decode_image` for
PIL/torchvision; nothing else changes.

Scale notes: binary payloads dominate partition size, so
`spark.sql.files.maxPartitionBytes` + a repartition by a content-size bucket
keeps Arrow batches bounded; metadata lives in a sibling struct column so
filters prune on it without touching bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes long, feature array<float>"


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table exercising the binary+metadata schema.
    Generated DISTRIBUTEDLY (spark.range → mapInPandas): payload bytes are a
    pure function of media_id, so the table scales to any n with no
    driver-side materialization."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        mimes = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = kinds[i % 3]
                payload = bytes((i * 31 + j * 7) % 256 for j in range(128 + (i % 5) * 64))
                rows.append(
                    {
                        "media_id": i,
                        "kind": kind,
                        "payload": payload,
                        "meta": {
                            "width": 64 + i % 8 if kind == "image" else None,
                            "height": 64 + i % 4 if kind == "image" else None,
                            "sample_rate": 16000 if kind == "audio" else None,
                            "n_frames": 30 * (1 + i % 3) if kind == "video" else None,
                            "mime": mimes[kind],
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def _decode_image(payload: bytes) -> list[float]:
    raise NotImplementedError(
        "real image decode requires PIL/libjpeg — not present in this "
        "container; call extract_features(decode_stub=True) for the "
        "deterministic fake path"
    )


def _fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoder+featurizer: byte histogram
    moments. Same shape/contract as a real embedding."""
    if payload is None:
        return [0.0] * dim
    return [float(sum(payload[j::dim]) % 1009) / 1009.0 for j in range(dim)]


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Arrow-batched decode → feature pipeline over mapInPandas. The batch
    iterator shape (many small pdfs per partition) is exactly what a real
    GPU/codec stage wants — per-batch model init amortized via the iterator."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_features(p) if decode_stub else _decode_image(p)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_nth: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: explode frame indices from metadata
    (decode stubbed — indices are what a real ffmpeg stage would consume)."""
    v = media.filter(F.col("kind") == "video")
    idx = F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_nth))
    return v.select("media_id", F.explode(idx).alias("frame_idx"))
