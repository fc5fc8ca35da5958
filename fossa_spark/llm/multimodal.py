"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schemas, Arrow-batched mapInPandas
decode/transform stages, partition sizing — and so are the IMAGE and
AUDIO paths: ``synthetic_media`` writes real grayscale PNGs (pure-stdlib
encoder: zlib + struct; the PNG spec is public) and real 16-bit PCM WAV
payloads (stdlib ``wave``), and ``_decode_image`` / ``_decode_audio``
parse them back and derive features from decoded pixels / samples.
Video remains a clearly-marked stub (`decode_stub=True` → deterministic
byte-histogram features), since no video codec exists in this container;
a deployment swaps ffmpeg in and nothing else about the plumbing changes.

Scale notes: binary payloads dominate partition size, so
`spark.sql.files.maxPartitionBytes` + a repartition by a content-size bucket
keeps Arrow batches bounded; metadata lives in a sibling struct column so
filters prune on it without touching bytes.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
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


def _encode_png(pixels: "np.ndarray") -> bytes:
    """Minimal 8-bit grayscale PNG encoder (PNG spec, RFC 2083): IHDR +
    one zlib IDAT with filter-0 scanlines + IEND. Pure stdlib."""
    h, w = pixels.shape

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit, grayscale
    raw = b"".join(b"\x00" + pixels[y].astype(np.uint8).tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _decode_png(payload: bytes) -> "np.ndarray":
    """Minimal 8-bit grayscale PNG decoder: parse chunks, inflate IDAT,
    undo scanline filters (all five types, per the spec)."""
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, w = 8, None
    idat = b""
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, color, *_ = struct.unpack(">IIBBBBB", data)
            if depth != 8 or color != 0:
                raise ValueError("decoder supports 8-bit grayscale only")
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = w + 1
    out = np.zeros((h, w), dtype=np.int32)
    for y in range(h):
        line = raw[y * stride : (y + 1) * stride]
        ftype, scan = line[0], np.frombuffer(line[1:], dtype=np.uint8).astype(np.int32)
        prev = out[y - 1] if y > 0 else np.zeros(w, dtype=np.int32)
        if ftype == 0:  # None
            out[y] = scan
        elif ftype == 2:  # Up
            out[y] = (scan + prev) & 0xFF
        else:  # Sub/Average/Paeth depend on the left neighbor: sequential
            row = np.zeros(w, dtype=np.int32)
            for x in range(w):
                a = row[x - 1] if x > 0 else 0
                b = prev[x]
                c = prev[x - 1] if x > 0 else 0
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                elif ftype == 4:  # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                else:
                    raise ValueError(f"bad PNG filter type {ftype}")
                row[x] = (scan[x] + pred) & 0xFF
            out[y] = row
    return out.astype(np.uint8)


def _encode_wav(samples: "np.ndarray", rate: int = 16000) -> bytes:
    """16-bit PCM mono WAV via the stdlib ``wave`` module (RIFF/WAVE spec
    is public; no codec library involved)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def _decode_wav(payload: bytes) -> tuple["np.ndarray", int]:
    """Parse a PCM WAV back to (int16 samples, sample_rate)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2 or w.getnchannels() != 1:
            raise ValueError("decoder supports 16-bit mono PCM only")
        rate = w.getframerate()
        frames = w.readframes(w.getnframes())
    return np.frombuffer(frames, dtype="<i2"), rate


def _audio_samples(media_id: int, n: int) -> "np.ndarray":
    """Deterministic int16 test tone: id-seeded triangle-ish wave."""
    j = np.arange(n)
    return (((media_id * 31 + j * 17) % 2048 - 1024) * 16).astype(np.int16)


def _image_pixels(media_id: int, w: int, h: int) -> "np.ndarray":
    """Deterministic test-pattern pixels (gradient + id-seeded ripple)."""
    yy, xx = np.mgrid[0:h, 0:w]
    return ((xx * 255) // max(w - 1, 1) + media_id * 37 + (yy * media_id) % 29) % 256


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic media table exercising the binary+metadata schema.
    Image rows carry REAL PNG payloads (encoded with _encode_png); audio/
    video carry opaque deterministic bytes. Generated DISTRIBUTEDLY
    (spark.range → mapInPandas): payloads are a pure function of media_id,
    so the table scales to any n with no driver-side materialization."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        mimes = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = kinds[i % 3]
                if kind == "image":
                    w, h = 64 + i % 8, 64 + i % 4
                    payload = _encode_png(_image_pixels(i, w, h).astype(np.uint8))
                elif kind == "audio":
                    w = h = None
                    payload = _encode_wav(
                        _audio_samples(i, 256 + (i % 5) * 64), rate=16000
                    )
                else:
                    w = h = None
                    payload = bytes(
                        (i * 31 + j * 7) % 256 for j in range(128 + (i % 5) * 64)
                    )
                rows.append(
                    {
                        "media_id": i,
                        "kind": kind,
                        "payload": payload,
                        "meta": {
                            "width": w,
                            "height": h,
                            "sample_rate": 16000 if kind == "audio" else None,
                            "n_frames": 30 * (1 + i % 3) if kind == "video" else None,
                            "mime": mimes[kind],
                        },
                    }
                )
            yield pd.DataFrame(rows)

    # partition count sized to the table: spark.range defaults to one
    # partition per core, which for a small table means paying Python-worker
    # fan-out for 2-row batches; at real scale pass a larger n and the same
    # ~4k-rows-per-partition sizing holds.
    n_parts = max(1, min(32, n // 4096 + 1))
    return spark.range(n, numPartitions=n_parts).mapInPandas(gen, MEDIA_SCHEMA)


def _decode_image(payload: bytes, dim: int = 8) -> list[float]:
    """Real decode path: parse the PNG, then derive features from the
    DECODED PIXELS — mean/std/min/max plus 4 quadrant means, all in
    [0, 1].  (A deployment swaps the featurizer for a vision model; the
    decode+feature contract and batch shape stay identical.)"""
    px = _decode_png(payload).astype(np.float64)
    h, w = px.shape
    quads = [
        px[: h // 2, : w // 2], px[: h // 2, w // 2 :],
        px[h // 2 :, : w // 2], px[h // 2 :, w // 2 :],
    ]
    feats = [px.mean(), px.std(), px.min(), px.max()] + [q.mean() for q in quads]
    return [float(v) / 255.0 for v in feats[:dim]]


def _decode_audio(payload: bytes, dim: int = 8) -> list[float]:
    """Real decode path: parse the WAV, then derive features from the
    DECODED SAMPLES — duration (s), RMS, peak, zero-crossing rate, and
    4 quarter-window RMS values, amplitude terms normalized to [0, 1].
    (A deployment swaps the featurizer for an audio model; the
    decode+feature contract and batch shape stay identical.)"""
    samples, rate = _decode_wav(payload)
    x = samples.astype(np.float64) / 32768.0
    n = len(x)
    zc = float(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1]))) / max(
        n - 1, 1
    )
    quarters = np.array_split(x, 4)
    feats = [
        n / float(rate),
        float(np.sqrt(np.mean(x * x))),
        float(np.abs(x).max()),
        zc,
    ] + [float(np.sqrt(np.mean(q * q))) for q in quarters]
    return feats[:dim]


def _fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoder+featurizer: byte histogram
    moments. Same shape/contract as a real embedding."""
    if payload is None:
        return [0.0] * dim
    return [float(sum(payload[j::dim]) % 1009) / 1009.0 for j in range(dim)]


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Arrow-batched decode → feature pipeline over mapInPandas. The batch
    iterator shape (many small pdfs per partition) is exactly what a real
    GPU/codec stage wants — per-batch model init amortized via the iterator.

    ``decode_stub=False`` runs the REAL decoder where one exists (images:
    the pure-stdlib PNG path; audio: the stdlib WAV path) and falls back
    to the deterministic byte-histogram features for kinds with no codec
    in this container (video)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        real = {"image": _decode_image, "audio": _decode_audio}

        def featurize(payload, kind):
            if not decode_stub and kind in real:
                return real[kind](payload)
            return _fake_features(payload)

        for pdf in batches:
            feats = [
                featurize(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
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
