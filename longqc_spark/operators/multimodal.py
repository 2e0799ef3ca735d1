"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata.

The reference's analog is the FAST5/HDF5 path (``lq_utils.py:211-236``,
``lq_nanopore.py:102-117``): opaque container bytes scanned with
``binaryFile`` semantics, decoded per record by a vectorized kernel, metadata
extracted into typed columns — the reference does REAL container extraction
(h5py reads, ``lq_nanopore.py:102-117``), and so does this module for three
formats that need no external libs: 24-bit **BMP** images, PCM16 **WAV**
audio, and **LQCV video** (an uncompressed multi-frame container: magic +
frame count + length-prefixed BMP frames), all encoded/decoded in pure numpy
(``encode_bmp``/``decode_bmp``, ``encode_wav``/``decode_wav``,
``encode_video``/``decode_video_frames``). Foreign compressed containers
(PNG/JPEG/MP4) genuinely require libpng/ffmpeg and raise at the documented
codec boundary unless ``fake=True``.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T


# ---------------------------------------------------------------------------
# Real pure-numpy codecs (no external libraries)
# ---------------------------------------------------------------------------


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) RGB uint8 → 24-bit uncompressed BMP (BITMAPINFOHEADER):
    bottom-up BGR rows padded to 4-byte multiples."""
    h, w = img.shape[0], img.shape[1]
    row_size = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = img[..., ::-1].reshape(h, w * 3)  # RGB → BGR
    pixels = rows[::-1].tobytes()  # bottom-up row order
    file_header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 54)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return file_header + info_header + pixels


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP → (h, w, 3) RGB uint8. Handles bottom-up (positive
    height) and top-down (negative) row order and 4-byte row padding."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_offset,) = struct.unpack_from("<I", payload, 10)
    header_size, w, h_signed = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only 24-bit BI_RGB supported (bpp={bpp})")
    h = abs(h_signed)
    row_size = (w * 3 + 3) & ~3
    raw = np.frombuffer(payload, dtype=np.uint8, count=row_size * h, offset=data_offset)
    rows = raw.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if h_signed > 0:
        rows = rows[::-1]  # stored bottom-up
    return rows[..., ::-1].copy()  # BGR → RGB


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono samples → RIFF/WAVE PCM16."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        struct.pack("<4sI4s", b"RIFF", 4 + 8 + len(fmt) + 8 + len(pcm), b"WAVE")
        + struct.pack("<4sI", b"fmt ", len(fmt))
        + fmt
        + struct.pack("<4sI", b"data", len(pcm))
        + pcm
    )


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 mono → (int16 samples, sample_rate). Walks the chunk
    list, so extra chunks (LIST/fact) are tolerated."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAVE payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_format, channels, rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if audio_format != 1 or channels != 1 or bits != 16:
                raise NotImplementedError("only PCM16 mono supported")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return samples, rate

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("declared_mime", T.StringType()),
    ]
)


def synth_media_table(spark, n: int = 256, seed: int = 42) -> DataFrame:
    """Deterministic media corpus: REAL 24-bit BMP images, PCM16 WAV audio,
    and LQCV multi-frame video — every payload decodable by the pure-numpy
    codecs above."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    mimes = {"image": "image/bmp", "audio": "audio/wav", "video": "video/x-lqcv"}
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            h, w = int(rng.integers(8, 40)), int(rng.integers(8, 40))
            payload = encode_bmp(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))
        elif kind == "audio":
            n_samp = int(rng.integers(400, 4000))
            t = np.arange(n_samp)
            freq = float(rng.uniform(100, 2000))
            wave = 6000 * np.sin(2 * np.pi * freq * t / 16000) + rng.normal(0, 500, n_samp)
            payload = encode_wav(wave.astype(np.int16))
        else:
            nf = int(rng.integers(4, 16))
            h, w = int(rng.integers(8, 24)), int(rng.integers(8, 24))
            payload = encode_video(
                rng.integers(0, 256, size=(nf, h, w, 3), dtype=np.uint8)
            )
        rows.append((i, kind, payload, mimes[kind]))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["media_id", "kind", "payload", "declared_mime"]), schema=MEDIA_SCHEMA)


def write_media_files(spark, out_dir: str, n: int = 48, seed: int = 42) -> str:
    """Materialize the synthetic media corpus as one FILE PER OBJECT (the
    layout ``binaryFile`` expects — a landing bucket of raw .png/.wav/.mp4
    objects, the FAST5-directory analog ``lq_nanopore.py:217-236``)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    ext = {"image": "bmp", "audio": "wav", "video": "lqcv"}
    for row in synth_media_table(spark, n=n, seed=seed).collect():
        with open(os.path.join(out_dir, f"{row.media_id:06d}.{ext[row.kind]}"), "wb") as f:
            f.write(bytes(row.payload))
    return out_dir


def scan_media_files(spark, in_dir: str) -> DataFrame:
    """``binaryFile`` source → the MEDIA_SCHEMA shape: path-derived id/kind,
    payload as the opaque binary column. PushedFilters on path/length work as
    with any file source; at scale, partition the bucket by kind/date."""
    ext_kind = F.element_at(F.split(F.col("path"), r"\."), -1)
    kind = (
        F.when(ext_kind == "bmp", "image")
        .when(ext_kind == "wav", "audio")
        .otherwise("video")
    )
    mime = (
        F.when(kind == "image", "image/bmp")
        .when(kind == "audio", "audio/wav")
        .otherwise("video/x-lqcv")
    )
    media_id = F.regexp_extract(F.element_at(F.split(F.col("path"), "/"), -1), r"^(\d+)", 1)
    return (
        spark.read.format("binaryFile")
        .load(in_dir)
        .select(
            media_id.cast("long").alias("media_id"),
            kind.alias("kind"),
            F.col("content").alias("payload"),
            mime.alias("declared_mime"),
        )
    )


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """BMP payloads decode for REAL (pure numpy, ``decode_bmp``). Other
    formats (PNG/JPEG) need libpng/libjpeg — not in this container — so they
    raise unless ``fake=True`` (deterministic pseudo-decode seeded from
    crc32(payload), for plumbing tests only)."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if not fake:
        raise NotImplementedError(
            "non-BMP image decode requires PIL/pyvips; BMP decodes natively"
        )
    h = zlib.crc32(payload)
    rng = np.random.default_rng(h)
    w, ht = 16 + h % 48, 16 + (h >> 8) % 48
    return rng.integers(0, 256, size=(ht, w, 3), dtype=np.uint8)


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("magic_ok", T.BooleanType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_cross_frac", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

_MAGIC = {"image": b"BM", "audio": b"RIFF", "video": b"LQCV"}


def extract_features(media: DataFrame, fake_decode: bool = False) -> DataFrame:
    """binary payload → typed feature row, Arrow-batched.

    REAL decode paths (the default): BMP images (dims, mean luma, 8-bin
    pixel histogram as the embedding) and WAV audio (sample count/rate, RMS,
    zero-crossing fraction, 8-band magnitude-spectrum profile via rfft).
    Video rows keep container-level stats here (per-frame stats live in
    ``sample_frames``). ``fake_decode=True`` only affects foreign image
    formats (PNG/JPEG pseudo-decode for plumbing tests).

    Production shape: one ``mapInPandas`` pass per partition, payloads
    decoded batch-wise, features emitted as ``array<float>`` ready for the
    simsearch operators. Partitioning: repartition upstream by
    ``xxhash64(media_id)`` for uniform decode cost."""

    def compute(batches):
        for pdf in batches:
            n = len(pdf)
            out = {
                "media_id": pdf.media_id.to_numpy(),
                "kind": pdf.kind.to_numpy(),
                "n_bytes": np.fromiter((len(b) for b in pdf.payload), dtype=np.int64, count=n),
                "magic_ok": np.fromiter(
                    (bytes(b).startswith(_MAGIC.get(k, b"")) for b, k in zip(pdf.payload, pdf.kind)),
                    dtype=bool,
                    count=n,
                ),
                "width": np.zeros(n, dtype=np.int32),
                "height": np.zeros(n, dtype=np.int32),
                "mean_luma": np.zeros(n, dtype=np.float64),
                "n_samples": np.zeros(n, dtype=np.int32),
                "sample_rate": np.zeros(n, dtype=np.int32),
                "rms": np.zeros(n, dtype=np.float64),
                "zero_cross_frac": np.zeros(n, dtype=np.float64),
                "feature": np.empty(n, dtype=object),
            }
            for i, (payload, kind) in enumerate(zip(pdf.payload, pdf.kind)):
                if kind == "image":
                    img = decode_image(bytes(payload), fake=fake_decode)
                    out["height"][i], out["width"][i] = img.shape[0], img.shape[1]
                    out["mean_luma"][i] = float(img.mean())
                    hist, _ = np.histogram(img, bins=8, range=(0, 256))
                    out["feature"][i] = (hist / hist.sum()).astype(np.float32).tolist()
                elif kind == "audio":
                    samples, rate = decode_wav(bytes(payload))
                    x = samples.astype(np.float64)
                    out["n_samples"][i] = len(samples)
                    out["sample_rate"][i] = rate
                    out["rms"][i] = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
                    if len(x) > 1:
                        out["zero_cross_frac"][i] = float(
                            np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))
                        )
                    # 8-band magnitude-spectrum profile (L1-normalized);
                    # zero-length data chunks are valid WAV → empty feature
                    if len(x):
                        mag = np.abs(np.fft.rfft(x))
                        bands = np.array_split(mag, 8)
                        prof = np.array([b.sum() for b in bands])
                        tot = prof.sum()
                        out["feature"][i] = (
                            (prof / tot).astype(np.float32).tolist() if tot > 0 else []
                        )
                    else:
                        out["feature"][i] = []
                else:
                    out["feature"][i] = []
            yield pd.DataFrame(out)

    return media.mapInPandas(compute, schema=FEATURE_SCHEMA)


def resize_image(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy — REAL (no image lib needed):
    integer index gather on both axes, the vectorized inner kernel a
    production resize UDF would call per batch."""
    h, w = img.shape[0], img.shape[1]
    rows = (np.arange(out_h) * (h / out_h)).astype(np.int64)
    cols = (np.arange(out_w) * (w / out_w)).astype(np.int64)
    return img[rows][:, cols]


def sample_frame_indices(n_total: int, n_sample: int) -> np.ndarray:
    """Uniform temporal frame sampling (REAL): first frame of each of
    ``n_sample`` equal spans — deterministic, order-preserving. A zero-frame
    container (valid LQCV) yields an empty index set, not 0/0."""
    n_sample = min(n_sample, n_total)
    if n_sample == 0:
        return np.empty(0, dtype=np.int64)
    return (np.arange(n_sample) * (n_total / n_sample)).astype(np.int64)


VIDEO_MAGIC = b"LQCV"


def encode_video(frames: np.ndarray) -> bytes:
    """(n_frames, h, w, 3) RGB uint8 → LQCV container: ``LQCV`` magic,
    ``<I`` frame count, then each frame as a ``<I`` length-prefixed 24-bit
    BMP. Uncompressed by design (the container reuses the real BMP codec);
    the reference analog is FAST5's multi-read HDF5 container
    (``lq_nanopore.py:102-117``)."""
    parts = [VIDEO_MAGIC, struct.pack("<I", len(frames))]
    for fr in frames:
        bmp = encode_bmp(fr)
        parts.append(struct.pack("<I", len(bmp)))
        parts.append(bmp)
    return b"".join(parts)


def decode_video_frames(payload: bytes, fake: bool = False) -> np.ndarray:
    """LQCV containers decode for REAL (length-prefixed walk + ``decode_bmp``
    per frame) → (n_frames, h, w, 3) uint8. Foreign containers (mp4/mkv)
    need pyav/ffmpeg — absent here — so they raise unless ``fake=True``
    (deterministic pseudo-decode seeded from crc32(payload), plumbing tests
    only)."""
    if payload[:4] == VIDEO_MAGIC:
        if len(payload) < 8:
            raise ValueError("truncated LQCV container (no frame count)")
        (n_frames,) = struct.unpack_from("<I", payload, 4)
        frames, pos = [], 8
        for i in range(n_frames):
            if pos + 4 > len(payload):
                raise ValueError(f"truncated LQCV container at frame {i} header")
            (sz,) = struct.unpack_from("<I", payload, pos)
            if pos + 4 + sz > len(payload):
                raise ValueError(f"truncated LQCV container at frame {i} body")
            frames.append(decode_bmp(payload[pos + 4 : pos + 4 + sz]))
            pos += 4 + sz
        if not frames:  # zero-frame containers are valid — np.stack([]) is not
            return np.empty((0, 0, 0, 3), dtype=np.uint8)
        return np.stack(frames)
    if not fake:
        raise NotImplementedError(
            "non-LQCV video decode requires pyav/ffmpeg; LQCV decodes natively"
        )
    h = zlib.crc32(payload)
    rng = np.random.default_rng(h)
    n_frames = 8 + h % 56
    return rng.integers(0, 256, size=(n_frames, 12 + h % 20, 16 + (h >> 8) % 16, 3), dtype=np.uint8)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_frames_total", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def sample_frames(
    media: DataFrame, n_frames: int = 4, out_size: tuple[int, int] = (8, 8), fake_decode: bool = False
) -> DataFrame:
    """Video rows → ``n_frames`` sampled+resized frame-feature rows each
    (1→n UDTF shape, the record-expanding pattern of SURVEY.md §2.12; the
    reference analog is per-read window sampling, ``lq_gcfrac.py:37-47``).

    LQCV containers decode for REAL by default; sampling indices, resize,
    and the Arrow batch plumbing (one mapInPandas pass, list-accumulated
    frame rows) are the production implementation. ``fake_decode=True``
    pseudo-decodes foreign containers for plumbing tests."""
    oh, ow = out_size

    def compute(batches):
        for pdf in batches:
            vids = pdf[pdf.kind == "video"]
            rows = {k: [] for k in ("media_id", "frame_idx", "n_frames_total", "height", "width", "mean_luma", "feature")}
            for media_id, payload in zip(vids.media_id, vids.payload):
                frames = decode_video_frames(bytes(payload), fake=fake_decode)
                for idx in sample_frame_indices(len(frames), n_frames):
                    fr = resize_image(frames[idx], oh, ow)
                    hist, _ = np.histogram(fr, bins=8, range=(0, 256))
                    rows["media_id"].append(media_id)
                    rows["frame_idx"].append(int(idx))
                    rows["n_frames_total"].append(len(frames))
                    rows["height"].append(oh)
                    rows["width"].append(ow)
                    rows["mean_luma"].append(float(fr.mean()))
                    rows["feature"].append((hist / hist.sum()).astype(np.float32).tolist())
            # a partition with no video rows yields NOTHING: an empty
            # all-object DataFrame can't be Arrow-converted to list<float>
            if rows["media_id"]:
                yield pd.DataFrame(rows)

    return media.mapInPandas(compute, schema=FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual image hashing + near-dup (LAION-style image dedup)
# ---------------------------------------------------------------------------


def dhash64(img: np.ndarray) -> int:
    """64-bit difference hash of an RGB image: integer Rec.601 luma →
    9x8 nearest-neighbor downscale → horizontal-gradient sign bits.

    All-integer arithmetic (fixed-point luma, integer index resize), so the
    hash is bit-identical across platforms/BLAS builds — the property a
    distributed dedup key must have. Hamming distance between dhashes is
    the standard perceptual-near-dup metric (small crops / noise / light
    recompression move few bits; unrelated images differ in ~32).
    Reference analog: per-read fingerprint for duplicate detection
    (``lq_mask.py`` low-complexity masks as content signatures)."""
    px = img.astype(np.int64)
    luma = (299 * px[..., 0] + 587 * px[..., 1] + 114 * px[..., 2]) // 1000
    small = resize_image(luma, 8, 9)
    bits = (small[:, 1:] > small[:, :-1]).reshape(64)
    val = np.left_shift(
        bits.astype(np.uint64), np.arange(64, dtype=np.uint64)
    ).sum(dtype=np.uint64)
    return int(val.view(np.int64))  # two's-complement wrap into Spark's long


def image_dhash(
    media: DataFrame,
    key_col: str = "media_id",
    payload_col: str = "payload",
    fake_decode: bool = False,
) -> DataFrame:
    """Image rows → (key, dhash int64), Arrow-batched ``mapInPandas``.

    Caller filters to image rows (``kind == 'image'``); BMP payloads decode
    for REAL, foreign formats raise at the codec boundary unless
    ``fake_decode``. Scale posture: one decode pass, no shuffle — the hash
    fuses into the scan; pair generation happens downstream on the 8-byte
    hash only, never the pixels."""
    out_schema = T.StructType(
        [media.schema[key_col], T.StructField("dhash", T.LongType())]
    )

    def compute(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            hashes = np.fromiter(
                (
                    dhash64(decode_image(bytes(p), fake=fake_decode))
                    for p in pdf[payload_col]
                ),
                dtype=np.int64,
                count=len(pdf),
            )
            yield pd.DataFrame({key_col: pdf[key_col].to_numpy(), "dhash": hashes})

    return media.select(key_col, payload_col).mapInPandas(compute, schema=out_schema)


def image_near_pairs(
    media: DataFrame,
    key_col: str = "media_id",
    payload_col: str = "payload",
    max_hamming: int = 3,
    n_chunks: int = 4,
    max_bucket: int | None = None,
    fake_decode: bool = False,
) -> DataFrame:
    """Perceptual image near-dup: dhash64 per image, then the SAME
    chunk-banded hamming join the text SimHash path uses
    (``dedup.simhash_near_pairs`` — pigeonhole recall 1.0 for
    ``max_hamming <= n_chunks - 1``, ``max_bucket`` flood guard included).
    → (key_a, key_b, hamming).

    The pixels never cross a shuffle: the join operates on 8-byte hashes,
    so a 100 TB image corpus dedups over an ~n_images x 8B exchange.

    Radius/scale trade-off (measured at 250k images, BENCH_CORPUS):
    the default 16-bit chunks (n_chunks=4, radius 3) keep buckets tiny at
    ANY corpus size (65536 values per chunk position) at 99.9% recall on
    a +-2-jitter perturbation; n_chunks=8 widens the radius to 6 but its
    8-bit chunk values collide ~n/256 per bucket — quadratic candidates
    past ~10^5 images — so pair it with ``max_bucket`` when used at
    scale."""
    from .dedup import simhash_near_pairs

    sigs = image_dhash(media, key_col, payload_col, fake_decode).withColumnRenamed(
        "dhash", "simhash"
    )
    return simhash_near_pairs(
        sigs,
        key_col=key_col,
        max_hamming=max_hamming,
        n_chunks=n_chunks,
        max_bucket=max_bucket,
    )


def afp64(samples: np.ndarray) -> int:
    """64-bit Haitsma-Kalker audio fingerprint: band energies on a
    9-window x 9-band time-frequency grid, each bit the SIGN of the
    time-AND-frequency double difference (Haitsma & Kalker 2002, "A
    Highly Robust Audio Fingerprint System" — the published construction
    behind Philips/Gracenote matching, here at 64-bit granularity).

    The double difference cancels both gain (amplitude scales every cell)
    and static spectral tilt (a per-band offset cancels in the frequency
    difference), so gain changes move 0 bits and light additive noise
    moves a few, while unrelated broadband material moves ~32. Weak case:
    STATIONARY content (a bare synthesizer tone) has no temporal
    structure, so its bits sit closer to the noise floor (~10 under
    jitter) — real speech/music is the design target. Degenerate inputs
    (<32 samples) hash to 0."""
    x = np.asarray(samples, dtype=np.float64)
    if len(x) < 32:
        return 0
    energies = np.empty((9, 9))
    for w, win in enumerate(np.array_split(x, 9)):
        mag = np.abs(np.fft.rfft(win))[1:]  # drop DC
        energies[w] = [b.sum() for b in np.array_split(mag, 9)]
    freq_diff = energies[:, :-1] - energies[:, 1:]
    bits = (freq_diff[1:] - freq_diff[:-1] > 0).reshape(64)
    val = np.left_shift(
        bits.astype(np.uint64), np.arange(64, dtype=np.uint64)
    ).sum(dtype=np.uint64)
    return int(val.view(np.int64))


def audio_fingerprint(
    media: DataFrame, key_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Audio rows → (key, afp int64), Arrow-batched ``mapInPandas``
    (REAL WAV decode). Caller filters to audio rows; same scale posture as
    :func:`image_dhash` — the decode fuses into the scan, downstream pair
    generation exchanges 8-byte fingerprints only."""
    out_schema = T.StructType(
        [media.schema[key_col], T.StructField("afp", T.LongType())]
    )

    def compute(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            fps = np.fromiter(
                (afp64(decode_wav(bytes(p))[0]) for p in pdf[payload_col]),
                dtype=np.int64,
                count=len(pdf),
            )
            yield pd.DataFrame({key_col: pdf[key_col].to_numpy(), "afp": fps})

    return media.select(key_col, payload_col).mapInPandas(compute, schema=out_schema)


def audio_near_pairs(
    media: DataFrame,
    key_col: str = "media_id",
    payload_col: str = "payload",
    max_hamming: int = 3,
    n_chunks: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """Perceptual audio near-dup: afp64 per clip, then the SimHash
    chunk-banded hamming join (``dedup.simhash_near_pairs``) — identical
    machinery to :func:`image_near_pairs`, third payload modality, same
    radius/bucket-width trade-off (n_chunks=8 for radius 6 needs
    ``max_bucket`` past ~10^5 clips).
    → (key_a, key_b, hamming)."""
    from .dedup import simhash_near_pairs

    sigs = audio_fingerprint(media, key_col, payload_col).withColumnRenamed(
        "afp", "simhash"
    )
    return simhash_near_pairs(
        sigs,
        key_col=key_col,
        max_hamming=max_hamming,
        n_chunks=n_chunks,
        max_bucket=max_bucket,
    )


def video_frame_dhashes(
    media: DataFrame,
    key_col: str = "media_id",
    payload_col: str = "payload",
    n_frames: int = 4,
    fake_decode: bool = False,
) -> DataFrame:
    """Video rows → (key, frame_idx, dhash) for ``n_frames`` uniformly
    sampled frames (REAL LQCV decode + :func:`dhash64` per frame) — the
    record-expanding 1→n shape of ``sample_frames`` with the perceptual
    hash as the payload. Zero-frame containers yield no rows."""
    out_schema = T.StructType(
        [
            media.schema[key_col],
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("dhash", T.LongType()),
        ]
    )

    def compute(batches):
        for pdf in batches:
            rows = {key_col: [], "frame_idx": [], "dhash": []}
            for key, payload in zip(pdf[key_col], pdf[payload_col]):
                frames = decode_video_frames(bytes(payload), fake=fake_decode)
                for idx in sample_frame_indices(len(frames), n_frames):
                    rows[key_col].append(key)
                    rows["frame_idx"].append(int(idx))
                    rows["dhash"].append(dhash64(frames[idx]))
            if rows[key_col]:
                yield pd.DataFrame(rows)

    return media.select(key_col, payload_col).mapInPandas(compute, schema=out_schema)


def video_near_pairs(
    media: DataFrame,
    key_col: str = "media_id",
    payload_col: str = "payload",
    n_frames: int = 4,
    min_frames: int = 2,
    max_hamming: int = 3,
    n_chunks: int = 4,
    max_bucket: int | None = None,
    fake_decode: bool = False,
) -> DataFrame:
    """Perceptual VIDEO near-dup: frame-level dhash matching rolled up to
    a scene-level decision — two videos pair when at least ``min_frames``
    of their sampled-frame hashes sit within ``max_hamming`` of each
    other. → (key_a, key_b, n_frame_matches, min_hamming).

    Completes the modality triple through ONE join implementation: the
    frame hashes ride the same SimHash chunk-band join as text/image/
    audio (frame identity is a composite string key, split back after the
    join); ``min_frames`` is what makes this scene-level — a single
    coincidental frame match (a black frame, a title card) does not pair
    two videos. Same scale posture: pixels stay inside the decode
    ``mapInPandas``, the join exchanges 8-byte hashes × ``n_frames``."""
    from .dedup import simhash_near_pairs

    fd = video_frame_dhashes(media, key_col, payload_col, n_frames, fake_decode)
    sigs = fd.select(
        F.concat_ws(
            "#", F.col(key_col).cast("string"), F.col("frame_idx").cast("string")
        ).alias("_fk"),
        F.col("dhash").alias("simhash"),
    )
    pairs = simhash_near_pairs(
        sigs,
        key_col="_fk",
        max_hamming=max_hamming,
        n_chunks=n_chunks,
        max_bucket=max_bucket,
    )
    va = F.substring_index("key_a", "#", 1).cast("long")
    vb = F.substring_index("key_b", "#", 1).cast("long")
    return (
        pairs.select(
            F.least(va, vb).alias("key_a"),
            F.greatest(va, vb).alias("key_b"),
            F.col("hamming"),
        )
        .filter(F.col("key_a") != F.col("key_b"))  # frame pairs within one
        # video (a static scene) carry no cross-video signal
        .groupBy("key_a", "key_b")
        .agg(
            F.count(F.lit(1)).alias("n_frame_matches"),
            F.min("hamming").alias("min_hamming"),
        )
        .filter(F.col("n_frame_matches") >= min_frames)
    )
