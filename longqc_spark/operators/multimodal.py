"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata.

The reference's analog is the FAST5/HDF5 path (``lq_utils.py:211-236``,
``lq_nanopore.py:102-117``): opaque container bytes scanned with
``binaryFile`` semantics, decoded per record by a vectorized kernel, metadata
extracted into typed columns. Decode itself is STUBBED here (no image/audio
libraries in this container): ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, in which case a deterministic
fake decoder (seeded from the payload hash) produces realistic-shaped
outputs so the Spark-side plumbing — schema, batch shape, partitioning —
is real and tested end-to-end.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("declared_mime", T.StringType()),
    ]
)


def synth_media_table(spark, n: int = 256, seed: int = 42) -> DataFrame:
    """Deterministic fake media corpus (binary payloads with magic bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    magic = {"image": b"\x89PNG", "audio": b"RIFF", "video": b"\x00\x00\x00\x18ftyp"}
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        body = rng.integers(0, 256, size=int(rng.integers(64, 2048)), dtype=np.uint8).tobytes()
        rows.append((i, kind, magic[kind] + body, f"{kind}/x-fake"))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["media_id", "kind", "payload", "declared_mime"]), schema=MEDIA_SCHEMA)


def write_media_files(spark, out_dir: str, n: int = 48, seed: int = 42) -> str:
    """Materialize the synthetic media corpus as one FILE PER OBJECT (the
    layout ``binaryFile`` expects — a landing bucket of raw .png/.wav/.mp4
    objects, the FAST5-directory analog ``lq_nanopore.py:217-236``)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    ext = {"image": "png", "audio": "wav", "video": "mp4"}
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
        F.when(ext_kind == "png", "image")
        .when(ext_kind == "wav", "audio")
        .otherwise("video")
    )
    media_id = F.regexp_extract(F.element_at(F.split(F.col("path"), "/"), -1), r"^(\d+)", 1)
    return (
        spark.read.format("binaryFile")
        .load(in_dir)
        .select(
            media_id.cast("long").alias("media_id"),
            kind.alias("kind"),
            F.col("content").alias("payload"),
            F.concat(kind, F.lit("/x-fake")).alias("declared_mime"),
        )
    )


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """STUB: real decode needs PIL/libvips (not in this container).

    ``fake=True`` → deterministic pseudo-decode: dims and pixel stats seeded
    from crc32(payload), so tests exercise the full Arrow round-trip."""
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/pyvips; install and replace this stub "
            "(plumbing below is production-shaped)"
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
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

_MAGIC = {"image": b"\x89PNG", "audio": b"RIFF", "video": b"\x00\x00\x00\x18ftyp"}


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """binary payload → typed feature row, Arrow-batched.

    Production shape: one ``mapInPandas`` pass per partition, payloads decoded
    batch-wise, features emitted as ``array<float>`` ready for the simsearch
    operators. Partitioning: repartition upstream by ``xxhash64(media_id)``
    for uniform decode cost (same pattern as the text pipeline)."""

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
                "feature": np.empty(n, dtype=object),
            }
            for i, (payload, kind) in enumerate(zip(pdf.payload, pdf.kind)):
                if kind == "image":
                    img = decode_image(bytes(payload), fake=fake_decode)
                    out["height"][i], out["width"][i] = img.shape[0], img.shape[1]
                    out["mean_luma"][i] = float(img.mean())
                    # 8-bin histogram as the stand-in embedding
                    hist, _ = np.histogram(img, bins=8, range=(0, 256))
                    out["feature"][i] = (hist / hist.sum()).astype(np.float32).tolist()
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
    ``n_sample`` equal spans — deterministic, order-preserving."""
    n_sample = min(n_sample, n_total)
    return (np.arange(n_sample) * (n_total / n_sample)).astype(np.int64)


def decode_video_frames(payload: bytes, fake: bool = False) -> np.ndarray:
    """STUB: real decode needs pyav/ffmpeg. ``fake=True`` → deterministic
    pseudo-decode seeded from crc32(payload): (n_frames, h, w, 3) uint8."""
    if not fake:
        raise NotImplementedError(
            "video decode requires pyav/ffmpeg; install and replace this stub"
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
    media: DataFrame, n_frames: int = 4, out_size: tuple[int, int] = (8, 8), fake_decode: bool = True
) -> DataFrame:
    """Video rows → ``n_frames`` sampled+resized frame-feature rows each
    (1→n UDTF shape, the record-expanding pattern of SURVEY.md §2.12; the
    reference analog is per-read window sampling, ``lq_gcfrac.py:37-47``).

    Only the decode is stubbed: sampling indices, resize, and the Arrow
    batch plumbing (one mapInPandas pass, list-accumulated frame rows) are
    the production implementation."""
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
            yield pd.DataFrame(rows)

    return media.mapInPandas(compute, schema=FRAME_SCHEMA)
