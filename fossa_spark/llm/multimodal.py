"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schemas, Arrow-batched mapInPandas
decode/transform stages, partition sizing — and so are ALL THREE media
paths: ``synthetic_media`` writes real grayscale PNGs (pure-stdlib
encoder: zlib + struct; the PNG spec is public), real 16-bit PCM WAV
payloads (stdlib ``wave``), and real YUV4MPEG2 (.y4m) video payloads
(mono plane; the Y4M layout is public — a plain-text stream header plus
``FRAME\n``-delimited raw planes, the format mjpegtools/ffmpeg exchange
uncompressed video in).  ``_decode_image`` / ``_decode_audio`` /
``_decode_video`` parse the bytes back and derive features from decoded
pixels / samples / frames; ``frame_sample(decode=True)`` seeks straight
to sampled frames by fixed stride without materializing the rest.  A
deployment swaps ffmpeg in for compressed codecs and nothing else about
the plumbing changes.

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


def _encode_y4m(frames: "np.ndarray", fps: tuple[int, int] = (25, 1)) -> bytes:
    """Minimal YUV4MPEG2 encoder, mono colorspace: text stream header +
    per-frame ``FRAME\\n`` marker + raw 8-bit Y plane. Pure stdlib —
    the Y4M layout is public (mjpegtools / ffmpeg interchange format)."""
    n, h, w = frames.shape
    header = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 Cmono\n".encode()
    body = b"".join(
        b"FRAME\n" + frames[i].astype(np.uint8).tobytes() for i in range(n)
    )
    return header + body


def _parse_y4m_header(payload: bytes) -> tuple[int, int, int, int, int]:
    """Return (width, height, fps_num, fps_den, header_end_offset)."""
    end = payload.index(b"\n")
    fields = payload[:end].decode().split()
    if fields[0] != "YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = fn = fd = None
    for tok in fields[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            fn, fd = (int(x) for x in tok[1:].split(":"))
        elif tok[0] == "C" and tok[1:] != "mono":
            raise ValueError("decoder supports mono (single-plane) Y4M only")
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    return w, h, fn or 25, fd or 1, end + 1


def _decode_y4m(payload: bytes) -> tuple["np.ndarray", float]:
    """Parse a mono Y4M back to (frames (n,h,w) uint8, fps). Frames sit at
    a FIXED stride after the stream header, so decoding frame k is an O(1)
    seek — what frame_sample(decode=True) relies on."""
    w, h, fn, fd, pos = _parse_y4m_header(payload)
    fsize = w * h
    frames = []
    while pos < len(payload):
        nl = payload.index(b"\n", pos)  # FRAME marker (may carry params)
        if not payload[pos:nl].startswith(b"FRAME"):
            raise ValueError("bad Y4M frame marker")
        plane = payload[nl + 1 : nl + 1 + fsize]
        frames.append(
            np.frombuffer(plane, dtype=np.uint8).reshape(h, w)
        )
        pos = nl + 1 + fsize
    return np.stack(frames), fn / fd


def _video_frames(media_id: int, n_frames: int, w: int, h: int) -> "np.ndarray":
    """Deterministic test clip: the image test pattern panned one column
    per frame with a small brightness ramp — real temporal structure for
    the temporal-diff features."""
    base = _image_pixels(media_id, w, h)
    return np.stack(
        [(np.roll(base, -k, axis=1) + 3 * k) % 256 for k in range(n_frames)]
    ).astype(np.uint8)


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
    Every kind carries a REAL payload — PNG images (_encode_png), PCM WAV
    audio (_encode_wav), mono Y4M video (_encode_y4m). Generated
    DISTRIBUTEDLY (spark.range → mapInPandas): payloads are a pure function
    of media_id, so the table scales to any n with no driver-side
    materialization."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        mimes = {
            "image": "image/png",
            "audio": "audio/wav",
            "video": "video/x-yuv4mpeg",
        }
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kind = kinds[i % 3]
                nf = None
                if kind == "image":
                    w, h = 64 + i % 8, 64 + i % 4
                    payload = _encode_png(_image_pixels(i, w, h).astype(np.uint8))
                elif kind == "audio":
                    w = h = None
                    payload = _encode_wav(
                        _audio_samples(i, 256 + (i % 5) * 64), rate=16000
                    )
                else:
                    w, h = 32, 24
                    nf = 10 * (1 + i % 3) + 1  # 11/21/31 frames @ 25fps
                    payload = _encode_y4m(_video_frames(i, nf, w, h))
                rows.append(
                    {
                        "media_id": i,
                        "kind": kind,
                        "payload": payload,
                        "meta": {
                            "width": w,
                            "height": h,
                            "sample_rate": 16000 if kind == "audio" else None,
                            "n_frames": nf,
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


def _decode_video(payload: bytes, dim: int = 8) -> list[float]:
    """Real decode path: parse the Y4M, then derive features from the
    DECODED FRAMES — duration (s), mean luma, spatial std, temporal-diff
    RMS (motion energy), and 4 temporal-quarter mean-luma values, the
    luma terms normalized to [0, 1].  (A deployment swaps the featurizer
    for a video model; the decode+feature contract stays identical.)"""
    frames, fps = _decode_y4m(payload)
    x = frames.astype(np.float64) / 255.0
    n = x.shape[0]
    tdiff = (
        float(np.sqrt(np.mean((x[1:] - x[:-1]) ** 2))) if n > 1 else 0.0
    )
    quarters = np.array_split(x, 4)
    feats = [
        n / fps,
        float(x.mean()),
        float(x.std()),
        tdiff,
    ] + [float(q.mean()) if q.size else 0.0 for q in quarters]
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

    ``decode_stub=False`` runs the REAL decoder for every kind (images:
    pure-stdlib PNG; audio: stdlib WAV; video: pure-stdlib mono Y4M);
    ``decode_stub=True`` keeps the deterministic byte-histogram stand-in
    (the shape a compressed-codec deployment would slot ffmpeg into)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        real = {
            "image": _decode_image,
            "audio": _decode_audio,
            "video": _decode_video,
        }

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


def resize_images(media: DataFrame, width: int = 16, height: int = 16) -> DataFrame:
    """Image resize (the decode → transform → re-encode hop of a vision
    preprocessing pipeline): decode each PNG, nearest-neighbor downsample
    to ``width``×``height`` with pure integer index mapping
    (src = dst·src_dim // dst_dim — deterministic, no float resampling
    kernel to drift across platforms), re-encode as PNG.

    Only image rows reach Python; Arrow-batched mapInPandas, one decode +
    one encode per row — O(pixels), embarrassingly parallel, the same
    batch shape a Pillow/torchvision deployment would slot into."""
    im = media.filter(F.col("kind") == "image")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, payloads = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = _decode_png(payload)
                h, w = px.shape
                ys = (np.arange(height) * h) // height
                xs = (np.arange(width) * w) // width
                small = px[np.ix_(ys, xs)].astype(np.uint8)
                ids.append(mid)
                ws.append(width)
                hs.append(height)
                payloads.append(_encode_png(small))
            yield pd.DataFrame(
                {"media_id": ids, "width": ws, "height": hs,
                 "payload": payloads}
            )

    return im.select("media_id", "payload").mapInPandas(
        run, "media_id long, width int, height int, payload binary"
    )


def frame_sample(
    media: DataFrame, every_nth: int = 10, decode: bool = False
) -> DataFrame:
    """Video frame sampling.

    ``decode=False``: explode frame indices from metadata — the index
    stream a downstream ffmpeg/seek stage would consume.  ``decode=True``:
    REAL path — parse each Y4M header, seek straight to every nth frame by
    fixed stride (frames after the stream header are fixed-size, so a
    sampled frame costs O(frame) not O(clip)), and emit per-frame mean
    luma. Arrow-batched mapInPandas; only video rows reach Python."""
    v = media.filter(F.col("kind") == "video")
    if not decode:
        idx = F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_nth))
        return v.select("media_id", F.explode(idx).alias("frame_idx"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lumas = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, _, _, start = _parse_y4m_header(payload)
                fsize = w * h
                stride = len(b"FRAME\n") + fsize
                n = (len(payload) - start) // stride
                for k in range(0, n, every_nth):
                    off = start + k * stride + len(b"FRAME\n")
                    plane = np.frombuffer(
                        payload[off : off + fsize], dtype=np.uint8
                    )
                    ids.append(mid)
                    idxs.append(k)
                    lumas.append(float(plane.mean()) / 255.0)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "mean_luma": lumas}
            )

    return v.select("media_id", "payload").mapInPandas(
        run, "media_id long, frame_idx int, mean_luma double"
    )


def _ahash(px: "np.ndarray", hash_dim: int = 8) -> int:
    """Average hash (aHash) of a decoded grayscale image: block-mean
    downsample to hash_dim x hash_dim, threshold each cell at the grid
    mean, pack row-major into one unsigned integer (64 bits at the
    default). Pure integer index mapping, deterministic across
    platforms — the classic cheap perceptual fingerprint (dHash/pHash
    swap the thresholding, same plumbing)."""
    h, w = px.shape
    if h < hash_dim or w < hash_dim:
        # smaller images would produce empty block slices whose mean is
        # NaN — every threshold comparison then yields False and ALL
        # tiny images hash to 0, i.e. spurious hamming-0 "duplicates"
        # (review r10 session 2): refuse loudly instead
        raise ValueError(
            f"image {w}x{h} smaller than hash grid {hash_dim}x{hash_dim}"
        )
    px = px.astype(np.float64)
    ys = (np.arange(hash_dim + 1) * h) // hash_dim
    xs = (np.arange(hash_dim + 1) * w) // hash_dim
    grid = np.empty((hash_dim, hash_dim), dtype=np.float64)
    for i in range(hash_dim):
        for j in range(hash_dim):
            grid[i, j] = px[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean()
    bits = (grid > grid.mean()).flatten()
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return out


def image_phash(media: DataFrame, hash_dim: int = 8) -> DataFrame:
    """Perceptual-hash fingerprints for the image rows: decode each PNG
    (the real pure-stdlib codec), average-hash the pixels, emit
    (media_id, phash) with the hash as a SIGNED bigint (the two's-
    complement reinterpretation of the 64-bit fingerprint — XOR and
    bit_count are sign-agnostic, so Hamming math downstream is exact).

    Only image rows reach Python; Arrow-batched mapInPandas, one decode
    + one O(pixels) hash per row — embarrassingly parallel, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                hv = _ahash(_decode_png(payload), hash_dim)
                # reinterpret as signed 64-bit for the bigint column
                if hv >= 1 << 63:
                    hv -= 1 << 64
                ids.append(mid)
                hashes.append(hv)
            yield pd.DataFrame({"media_id": ids, "phash": hashes})

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(run, "media_id long, phash long")
    )


def phash_near_dup(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Image near-duplicate pairs by perceptual-hash Hamming distance —
    the pigeonhole banding of llm/dedup.py's SimHash applied to the
    image fingerprints: the 64-bit hash splits into ``max_hamming + 1``
    slices, and any pair within Hamming ``max_hamming`` must agree
    EXACTLY on at least one slice, so candidates come from equi-joining
    per-band buckets — never an all-pairs scan. Exact Hamming
    (bit_count(a XOR b), JVM-side) then filters the candidates.

    (The former ``bands`` parameter was dropped — advisor r10: it was
    validated but otherwise ignored, since the delegate always bands
    into max_hamming + 1 chunks; a misleading knob is worse than none.)

    Returns (id_a, id_b, hamming), id_a < id_b, distinct."""
    if not 0 <= max_hamming < 64:
        raise ValueError(
            "pigeonhole banding of a 64-bit hash needs "
            f"0 <= max_hamming < 64, got {max_hamming}"
        )
    # ONE banding implementation in the repo: delegate to the SimHash
    # pair join (llm/dedup.py simhash_pairs), which does exactly this
    # over a precomputed 64-bit signature table — including absorbing
    # the 64 % chunks remainder bits into the last slice, which a naive
    # equal split silently drops (review r10 session 2).
    from fossa_spark.llm.dedup import simhash_pairs

    sigs = hashes.select(
        F.col("media_id").alias("doc_id"), F.col("phash").alias("sig")
    )
    pairs = simhash_pairs(None, sigs=sigs, max_hamming=max_hamming)
    return pairs.select(
        F.col("id_a"), F.col("id_b"), F.col("hamming").cast("int").alias("hamming")
    )


def synthetic_random_images(
    spark: SparkSession, n: int = 48, w: int = 64, h: int = 64
) -> DataFrame:
    """Id-seeded pseudo-random PNG images (media_id, kind='image',
    payload) — the fingerprint-friendly test corpus: random pixels give
    every image a near-uniform 64-bit aHash, so distinct images differ
    by ~32 bits and only PLANTED perturbed copies land within a small
    Hamming radius. (synthetic_media's gradient test pattern is the
    WRONG corpus for perceptual hashing: the shared x-gradient dominates
    every block mean, hashing all images to nearly the same value.)
    Generated distributedly; payload is a pure function of media_id."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                px = np.random.default_rng(i).integers(
                    0, 256, size=(h, w)
                ).astype(np.uint8)
                rows.append(
                    {"media_id": i, "kind": "image",
                     "payload": _encode_png(px)}
                )
            yield pd.DataFrame(rows)

    n_parts = max(1, min(32, n // 4096 + 1))
    return spark.range(n, numPartitions=n_parts).mapInPandas(
        gen, "media_id long, kind string, payload binary"
    )


def perturb_images(
    media: DataFrame,
    id_offset: int = 100_000,
    every: int = 4,
    flips: int = 3,
) -> DataFrame:
    """Near-identical copies of every ``every``-th image: decode, bump
    ``flips`` id-seeded pixel positions by +16 (mod 256), re-encode under
    media_id + id_offset. The planted near-duplicates a perceptual-hash
    dedup must recover — a few changed pixels move a block mean by at
    most a fraction of a gray level, so the aHash shifts 0-2 bits."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, payloads = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                mid = int(mid)
                if mid % every != 0:
                    continue
                px = _decode_png(payload).astype(np.int64)
                rng = np.random.default_rng(mid + 1)
                h, w = px.shape
                for _ in range(flips):
                    y, x = int(rng.integers(h)), int(rng.integers(w))
                    px[y, x] = (px[y, x] + 16) % 256
                ids.append(mid + id_offset)
                kinds.append("image")
                payloads.append(_encode_png(px.astype(np.uint8)))
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "payload": payloads}
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, "media_id long, kind string, payload binary"
    )


def synthetic_random_audio(
    spark: SparkSession, n: int = 48, length: int = 2048
) -> DataFrame:
    """Id-seeded random-noise WAV clips (media_id, kind='audio',
    payload) — the fingerprint-friendly audio corpus, for the same
    reason as synthetic_random_images: the periodic triangle test tone
    has a near-flat block-RMS envelope, so envelope fingerprints
    degenerate; seeded noise gives every clip an individual envelope."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                x = np.random.default_rng(i ^ 0xA0D10).integers(
                    -16384, 16384, size=length
                ).astype(np.int16)
                rows.append(
                    {"media_id": i, "kind": "audio",
                     "payload": _encode_wav(x, rate=16000)}
                )
            yield pd.DataFrame(rows)

    n_parts = max(1, min(32, n // 4096 + 1))
    return spark.range(n, numPartitions=n_parts).mapInPandas(
        gen, "media_id long, kind string, payload binary"
    )


def perturb_audio(
    media: DataFrame,
    id_offset: int = 100_000,
    every: int = 4,
    amp: int = 512,
) -> DataFrame:
    """Near-identical copies of every ``every``-th clip: decode, add
    id-seeded uniform noise of amplitude ``amp`` (~3% of full scale at
    the default), re-encode under media_id + id_offset — the planted
    near-duplicates an audio fingerprint must recover (block-RMS deltas
    barely move, so only near-tie envelope bits flip)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, payloads = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                mid = int(mid)
                if mid % every != 0:
                    continue
                x, rate = _decode_wav(payload)
                rng = np.random.default_rng(mid + 7)
                noise = rng.integers(-amp, amp + 1, size=len(x))
                y = np.clip(
                    x.astype(np.int64) + noise, -32768, 32767
                ).astype(np.int16)
                ids.append(mid + id_offset)
                kinds.append("audio")
                payloads.append(_encode_wav(y, rate=rate))
            yield pd.DataFrame(
                {"media_id": ids, "kinds": kinds, "payload": payloads}
            ).rename(columns={"kinds": "kind"})

    return media.filter(F.col("kind") == "audio").mapInPandas(
        run, "media_id long, kind string, payload binary"
    )


def audio_fingerprint(media: DataFrame, n_bits: int = 64) -> DataFrame:
    """64-bit envelope fingerprint for the audio rows: decode each WAV
    (the real stdlib codec), compute the block-RMS envelope over
    ``n_bits + 1`` equal windows, emit the sign-of-delta bits
    (envelope dHash — the shape audio fingerprinters like Chromaprint
    build per frequency band; one band here keeps it stdlib-only).
    Output (media_id, phash signed bigint) — the SAME relation
    :func:`phash_near_dup` consumes, so banding + Hamming dedup is
    shared between modalities."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                x, _rate = _decode_wav(payload)
                x = x.astype(np.float64)
                blocks = np.array_split(x, n_bits + 1)
                rms = np.array([np.sqrt(np.mean(b * b)) for b in blocks])
                bits = rms[1:] > rms[:-1]
                hv = 0
                for b in bits:
                    hv = (hv << 1) | int(b)
                if hv >= 1 << 63:
                    hv -= 1 << 64
                ids.append(int(mid))
                hashes.append(hv)
            yield pd.DataFrame({"media_id": ids, "phash": hashes})

    return (
        media.filter(F.col("kind") == "audio")
        .select("media_id", "payload")
        .mapInPandas(run, "media_id long, phash long")
    )


def synthetic_random_videos(
    spark: SparkSession, n: int = 48, w: int = 32, h: int = 24,
    n_frames: int = 80,
) -> DataFrame:
    """Id-seeded random-noise Y4M clips (media_id, kind='video',
    payload) — the fingerprint-friendly video corpus (same rationale as
    synthetic_random_images/audio: the panned test pattern has a LINEAR
    per-frame-mean envelope, so every clip's temporal dHash degenerates;
    seeded noise gives each clip an individual envelope)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                fr = np.random.default_rng(i ^ 0x51DE0).integers(
                    0, 256, size=(n_frames, h, w)
                ).astype(np.uint8)
                rows.append(
                    {"media_id": i, "kind": "video",
                     "payload": _encode_y4m(fr)}
                )
            yield pd.DataFrame(rows)

    n_parts = max(1, min(32, n // 4096 + 1))
    return spark.range(n, numPartitions=n_parts).mapInPandas(
        gen, "media_id long, kind string, payload binary"
    )


def perturb_videos(
    media: DataFrame,
    id_offset: int = 100_000,
    every: int = 4,
    amp: int = 3,
) -> DataFrame:
    """Near-identical copies of every ``every``-th clip: decode, add
    id-seeded uniform pixel noise of amplitude ``amp``, re-encode under
    media_id + id_offset — the planted near-duplicates a temporal
    fingerprint must recover (per-frame means shift by fractions of a
    gray level, so only near-tie envelope bits flip)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, payloads = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                mid = int(mid)
                if mid % every != 0:
                    continue
                fr, _fps = _decode_y4m(payload)
                rng = np.random.default_rng(mid + 13)
                noise = rng.integers(-amp, amp + 1, size=fr.shape)
                y = np.clip(fr.astype(np.int64) + noise, 0, 255).astype(
                    np.uint8
                )
                ids.append(mid + id_offset)
                kinds.append("video")
                payloads.append(_encode_y4m(y))
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "payload": payloads}
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        run, "media_id long, kind string, payload binary"
    )


def video_fingerprint(media: DataFrame, n_bits: int = 64) -> DataFrame:
    """64-bit TEMPORAL fingerprint for the video rows: decode each Y4M
    (the real stdlib codec), take the per-frame spatial-mean envelope,
    group it into ``n_bits + 1`` windows, and emit the sign-of-delta
    bits — the video sibling of audio_fingerprint's envelope dHash (a
    production system hashes per-scene color histograms; the temporal
    plumbing and the banded Hamming dedup are identical). Output
    (media_id, phash signed bigint) — consumed by the SAME
    :func:`phash_near_dup` as images and audio."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames, _fps = _decode_y4m(payload)
                env = frames.reshape(frames.shape[0], -1).mean(axis=1)
                groups = np.array_split(env, n_bits + 1)
                g = np.array([x.mean() for x in groups])
                bits = g[1:] > g[:-1]
                hv = 0
                for b in bits:
                    hv = (hv << 1) | int(b)
                if hv >= 1 << 63:
                    hv -= 1 << 64
                ids.append(int(mid))
                hashes.append(hv)
            yield pd.DataFrame({"media_id": ids, "phash": hashes})

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(run, "media_id long, phash long")
    )
