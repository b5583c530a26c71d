"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side machinery — schema, partition sizing, Arrow batch shape,
mapInPandas signatures — is real and tested, and since round 2 so are the
codecs for the formats the standard library can express:

- **BMP** (24-bpp uncompressed) encode/decode — pure struct+numpy; real
  nearest-neighbor resize re-encoding the payload.
- **WAV** (16-bit PCM mono) encode/decode via the stdlib ``wave`` module;
  real RMS / zero-crossing audio features.
- **video** as a deterministic length-prefixed frame container
  (``VID0 | n_frames:u32 | fps:u32 | (len:u32, bmp)*``) — real frame
  sampling decodes ONLY the selected frames.

Formats that need external codecs (JPEG/MP4/…) still go through the
``decoder=`` injection point and raise ``NotImplementedError`` by default —
clearly marked; the plumbing contract is identical.

Scale notes: binary payloads dominate partition bytes — callers should size
``spark.sql.files.maxPartitionBytes`` down (payload rows are huge) and every
decode stage uses mapInPandas so one task streams Arrow batches without
materializing a partition of decoded frames at once; frame sampling never
decodes unselected frames.
"""

from __future__ import annotations

import io
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


# ------------------------------------------------------------------- codecs

def encode_bmp(img: np.ndarray) -> bytes:
    """24-bpp uncompressed BMP from an (H, W, 3) uint8 RGB array. Pure
    stdlib: 14-byte file header + 40-byte BITMAPINFOHEADER, rows bottom-up,
    BGR, padded to 4 bytes."""
    h, w, _ = img.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):
        body += img[y, :, ::-1].tobytes()  # RGB -> BGR
        body += b"\x00" * pad
    data_size = len(body)
    header = struct.pack("<2sIHHI", b"BM", 54 + data_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    return header + info + bytes(body)


def decode_bmp(payload: bytes) -> np.ndarray:
    """(H, W, 3) uint8 RGB array from a 24-bpp uncompressed BMP."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    if bpp != 24:
        raise NotImplementedError(f"only 24-bpp BMP supported, got {bpp}")
    row = w * 3
    pad = (4 - row % 4) % 4
    out = np.empty((abs(h), w, 3), dtype=np.uint8)
    pos = offset
    for i in range(abs(h)):
        y = abs(h) - 1 - i if h > 0 else i  # bottom-up unless negative height
        line = np.frombuffer(payload, dtype=np.uint8, count=row, offset=pos)
        out[y] = line.reshape(w, 3)[:, ::-1]  # BGR -> RGB
        pos += row + pad
    return out


def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """16-bit PCM mono WAV from an int16 array (stdlib ``wave``)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """(int16 samples, sample_rate) from a 16-bit PCM mono WAV."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2 or w.getnchannels() != 1:
            raise NotImplementedError("only 16-bit PCM mono supported")
        rate = w.getframerate()
        samples = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    return samples, rate


_VID_MAGIC = b"VID0"


def encode_video(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """Deterministic frame container: magic, frame count, fps, then
    length-prefixed BMP frames — seekable without decoding."""
    parts = [_VID_MAGIC, struct.pack("<II", len(frames), fps)]
    for f in frames:
        bmp = encode_bmp(f)
        parts.append(struct.pack("<I", len(bmp)))
        parts.append(bmp)
    return b"".join(parts)


def video_frame_count(payload: bytes) -> tuple[int, int]:
    if payload[:4] != _VID_MAGIC:
        raise ValueError("not a VID0 payload")
    return struct.unpack_from("<II", payload, 4)


def decode_video_frame(payload: bytes, index: int) -> np.ndarray:
    """Decode ONLY frame ``index`` (skips others via the length prefixes)."""
    n, _ = video_frame_count(payload)
    if not 0 <= index < n:
        raise IndexError(f"frame {index} out of range ({n} frames)")
    pos = 12
    for _ in range(index):
        pos += 4 + struct.unpack_from("<I", payload, pos)[0]
    ln = struct.unpack_from("<I", payload, pos)[0]
    return decode_bmp(payload[pos + 4 : pos + 4 + ln])


# -------------------------------------------------------------- media table

def synthetic_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic REAL media table: per-row payloads are valid BMP / WAV /
    VID0 bytes generated from a per-id RNG inside mapInPandas (Arrow-batched;
    generation is distributed, nothing materializes on the driver)."""
    base = spark.range(n).select(F.col("id").alias("media_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        mimes = {"image": "image/bmp", "audio": "audio/wav", "video": "video/x-vid0"}
        for b in batches:
            rows = []
            for mid in b["media_id"]:
                rng = np.random.default_rng(seed * 1_000_003 + int(mid))
                kind = kinds[int(mid) % 3]
                if kind == "image":
                    h, w = int(rng.integers(8, 24)), int(rng.integers(8, 24))
                    payload = encode_bmp(
                        rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                    )
                    dur = None
                elif kind == "audio":
                    rate = 16_000
                    n_samp = int(rng.integers(rate // 10, rate // 2))
                    t = np.arange(n_samp)
                    freq = float(rng.uniform(100, 2000))
                    samples = (10_000 * np.sin(2 * np.pi * freq * t / rate)).astype(
                        np.int16
                    )
                    payload = encode_wav(samples, rate)
                    h = w = None
                    dur = int(n_samp * 1000 / rate)
                else:
                    h, w = int(rng.integers(8, 16)), int(rng.integers(8, 16))
                    fps = 10
                    n_frames = int(rng.integers(3, 8))
                    frames = [
                        rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                        for _ in range(n_frames)
                    ]
                    payload = encode_video(frames, fps)
                    dur = int(n_frames * 1000 / fps)
                rows.append(
                    {
                        "media_id": int(mid),
                        "kind": kind,
                        "payload": payload,
                        "mime": mimes[kind],
                        "width": w,
                        "height": h,
                        "duration_ms": dur,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return base.mapInPandas(gen, MEDIA_SCHEMA)


# ---------------------------------------------------------------- operators

def _default_decode_features(kind: str, payload: bytes) -> np.ndarray:
    """Real feature kernels per modality (8-dim float32):
    image/video-frame-0 → per-channel mean/std + dims;
    audio → rms, zero-crossing rate, duration, peak."""
    if payload is None:
        return np.zeros(8, dtype=np.float32)
    if kind == "image":
        img = decode_bmp(payload).astype(np.float32)
    elif kind == "video":
        img = decode_video_frame(payload, 0).astype(np.float32)
    elif kind == "audio":
        samples, rate = decode_wav(payload)
        x = samples.astype(np.float32) / 32768.0
        zc = float(np.mean(np.abs(np.diff(np.signbit(x)).astype(np.float32))))
        return np.array(
            [
                float(np.sqrt(np.mean(x**2))),
                zc,
                len(x) / rate,
                float(np.max(np.abs(x))),
                float(np.mean(x)),
                float(np.std(x)),
                float(rate),
                float(len(x)),
            ],
            dtype=np.float32,
        )
    else:
        raise NotImplementedError(
            f"no stdlib codec for kind={kind!r}; inject decoder= for external formats"
        )
    return np.array(
        [
            img[..., 0].mean() / 255.0,
            img[..., 1].mean() / 255.0,
            img[..., 2].mean() / 255.0,
            img.std() / 255.0,
            img.shape[0],
            img.shape[1],
            img.mean() / 255.0,
            float(img.size),
        ],
        dtype=np.float32,
    )


def extract_features(media: DataFrame, decoder=None) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches). ``decoder``
    maps (kind, bytes) -> np.ndarray[float32]; defaults to the real stdlib
    BMP/WAV/VID0 kernels (external formats raise NotImplementedError)."""
    decode = decoder or _default_decode_features

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = [decode(k, p) for k, p in zip(b["kind"], b["payload"])]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "n_bytes": [len(p) if p is not None else 0 for p in b["payload"]],
                    "feature": [f.tolist() for f in feats],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """REAL nearest-neighbor resize of BMP payloads (numpy index maps inside
    mapInPandas), re-encoded; non-image rows pass through untouched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = b.copy()
            for i, (kind, payload) in enumerate(zip(b["kind"], b["payload"])):
                if kind != "image" or payload is None:
                    continue
                img = decode_bmp(payload)
                ys = (np.arange(target_h) * img.shape[0] // target_h).astype(int)
                xs = (np.arange(target_w) * img.shape[1] // target_w).astype(int)
                out.loc[out.index[i], "payload"] = encode_bmp(img[ys][:, xs])
                out.loc[out.index[i], "width"] = target_w
                out.loc[out.index[i], "height"] = target_h
            yield out[[f.name for f in MEDIA_SCHEMA.fields]]

    return media.mapInPandas(run, MEDIA_SCHEMA)


def _frame_times(every_ms: int):
    return F.sequence(
        F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms)
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame timestamp —
    pure Catalyst sequence explode. Metadata only (no payload column), so
    the explode never replicates payload bytes."""
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(_frame_times(every_ms)).alias("frame_ms"))
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_ms", T.IntegerType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("mean_rgb", T.ArrayType(T.FloatType()), True),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Execute the frame-sampling plan: decode ONLY the planned frames (the
    VID0 container is seekable; unselected frames are skipped byte-wise).

    The frame-time list stays an ARRAY column until inside the Python
    worker, so each video's payload crosses the Arrow boundary exactly once
    (a payload-carrying explode would replicate the bytes per frame row)."""
    plan = media.filter(F.col("kind") == "video").select(
        "media_id", "payload", _frame_times(every_ms).alias("frame_mss")
    )
    cols = [f.name for f in FRAME_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, payload, mss in zip(b["media_id"], b["payload"], b["frame_mss"]):
                n, fps = video_frame_count(payload)
                for ms in mss:
                    idx = min(int(ms * fps // 1000), n - 1)
                    frame = decode_video_frame(payload, idx)
                    rows.append(
                        {
                            "media_id": int(mid),
                            "frame_ms": int(ms),
                            "frame_idx": idx,
                            "mean_rgb": (frame.reshape(-1, 3).mean(axis=0) / 255.0)
                            .astype(np.float32)
                            .tolist(),
                        }
                    )
            # explicit columns: a zero-row Arrow batch must still carry the
            # output schema (pd.DataFrame([]) has no columns to select)
            yield pd.DataFrame(rows, columns=cols)

    return plan.mapInPandas(run, FRAME_SCHEMA)
