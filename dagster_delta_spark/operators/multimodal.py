"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
a metadata struct; decode/feature-extraction runs as Arrow-batched
``mapInPandas`` (the pattern that scales: one Python worker per
partition, columnar transfer, bounded batches).

Codecs: formats with a pure-Python/numpy decode are REAL — binary PPM
(P6) and uncompressed 24-bit BMP are parsed to pixel arrays and
resized with nearest-neighbor numpy indexing (see ``decode_image`` /
``nn_resize``), and 16-bit PCM RIFF/WAVE is encoded/decoded/resampled
with struct+numpy (``encode_wav`` / ``decode_wav`` / ``nn_resample``)
with rate/duration/RMS/zero-crossing features, and YUV4MPEG2 (y4m)
video — raw C444 planes behind text headers, the format ffmpeg
pipes — is encoded/decoded/frame-sampled with numpy (``encode_y4m``
/ ``decode_y4m`` / ``frame_sample_video`` / ``video_features``).
Formats that genuinely need native libraries
(JPEG/PNG/MP3/compressed-audio/compressed-video — no PIL/ffmpeg in
this container) stay behind a clearly-marked ``NotImplementedError``
stub; a real deployment swaps those for PIL/librosa/ffmpeg without
touching the Spark-side plumbing.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .relational import load

# Executors may not have this repo on PYTHONPATH (the driver extending
# sys.path does not propagate to Python workers), so closures here must
# not be pickled by module reference.  Registering the module for
# BY-VALUE cloudpickle serialization lets mapInPandas closures call the
# module-level codecs below directly — the function bodies ship inside
# the pickle.  The codecs only import numpy/struct (present on
# workers); nothing worker-side touches the rest of the package.
# This repo requires pyspark 4, whose vendored cloudpickle (>= 2.x)
# always provides register_pickle_by_value, so the except below is a
# last-resort guard, NOT a full fallback: if it ever fires, this
# module's mapInPandas operators additionally require the repo on the
# executors' PYTHONPATH (closures then pickle by module reference).
try:  # pragma: no cover - unreachable with the supported pyspark
    import sys as _sys

    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001 - see comment above
    pass

# ---------------------------------------------------------------------------
# pure-Python/numpy image codecs (PPM P6 + 24-bit BMP) — real, not stubs
# ---------------------------------------------------------------------------

PPM_MEDIA_TYPE = "image/x-portable-pixmap"
BMP_MEDIA_TYPE = "image/bmp"


def encode_ppm(arr) -> bytes:
    """(h, w, 3) uint8 array -> binary PPM (P6, maxval 255)."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    h, w = a.shape[0], a.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_ppm(payload: bytes):
    """Binary PPM (P6) -> (h, w, 3) uint8 numpy array.  Handles the
    whitespace/comment grammar of the header; maxval must be < 256."""
    import numpy as np

    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (missing P6 magic)")
    # header tokens: magic, width, height, maxval — comments (#..\n)
    # may appear between tokens
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = tokens
    if maxval >= 256:
        raise ValueError("16-bit PPM not supported")
    raster = np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=pos)
    return raster.reshape(h, w, 3)


def decode_bmp(payload: bytes):
    """Uncompressed 24-bit BI_RGB BMP -> (h, w, 3) uint8 RGB array.
    Rows are stored bottom-up and padded to 4 bytes; channels are BGR
    on disk."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP (missing BM magic)")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    flipped = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=h * stride, offset=data_offset
    ).reshape(h, stride)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return img[::-1] if flipped else img


def nn_resize(arr, out_h: int, out_w: int):
    """Nearest-neighbor resize via numpy integer index arrays — no
    Python pixel loop."""
    import numpy as np

    h, w = arr.shape[0], arr.shape[1]
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return arr[rows[:, None], cols[None, :]]


WAV_MEDIA_TYPE = "audio/wav"


def encode_wav(samples, rate: int) -> bytes:
    """Encode int16 PCM samples — shape ``(n,)`` mono or ``(n, ch)``
    interleaved — as a RIFF/WAVE payload.  Pure struct+numpy; real,
    not a stub."""
    import struct

    import numpy as np

    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    data = arr.reshape(-1).tobytes()
    block_align = ch * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, ch, rate, rate * block_align, block_align, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def decode_wav(payload: bytes):
    """Decode a RIFF/WAVE PCM payload -> (samples int16 ``(n, ch)``,
    rate).  Walks the chunk list properly (fmt/data may be preceded by
    LIST/fact chunks; chunks pad to even offsets).  Only
    uncompressed 16-bit PCM is in scope — compressed WAV (ADPCM,
    float, MP3-in-WAV) raises like the other native-codec formats."""
    import struct

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)   # chunks pad to even boundaries
    if fmt is None or data is None:
        raise ValueError("WAV payload missing fmt or data chunk")
    audio_format, ch, rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"only 16-bit PCM WAV is decodable here (format={audio_format}, "
            f"bits={bits}) — plug librosa/soundfile in for compressed audio"
        )
    arr = np.frombuffer(data[:len(data) - len(data) % (2 * ch)], dtype="<i2")
    return arr.reshape(-1, ch), rate


def nn_resample(samples, out_n: int):
    """Nearest-neighbor resample to ``out_n`` frames (channel count
    preserved) — the same index-mapping primitive as ``nn_resize``,
    over the time axis."""
    import numpy as np

    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n = arr.shape[0]
    if n == 0 or out_n <= 0:
        return arr[:0]
    idx = (np.arange(out_n) * n) // out_n
    return arr[idx]


def audio_features(payload: bytes) -> dict:
    """REAL audio features from the pure-numpy WAV decode: sample
    rate, duration, RMS level (full-scale-normalized), and
    zero-crossing rate (mean across channels)."""
    import numpy as np

    samples, rate = decode_wav(payload)
    x = samples.astype("float64") / 32768.0
    n = x.shape[0]
    zcr = 0.0
    if n > 1:
        zcr = float(np.mean(np.abs(np.diff(np.signbit(x), axis=0))))
    return {
        "audio_rate": int(rate),
        "audio_seconds": float(n / rate) if rate else 0.0,
        "audio_rms": float(np.sqrt(np.mean(np.square(x)))) if n else 0.0,
        "audio_zcr": zcr,
    }


def decode_image(payload: bytes, media_type: str):
    """Real decode for the pure-Python formats; NotImplementedError for
    codecs that need native libraries (the documented stub boundary)."""
    if media_type == PPM_MEDIA_TYPE:
        return decode_ppm(payload)
    if media_type == BMP_MEDIA_TYPE:
        return decode_bmp(payload)
    raise NotImplementedError(
        f"media codec for {media_type} not available in this environment"
    )


def binarize_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Create a multimodal-shaped table from documents: payload =
    utf-8 bytes, plus typed metadata (size, content hash, media
    type).  All JVM-side."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.octet_length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
        F.sha2("text", 256).alias("content_sha256"),
        F.lit("text/plain").alias("media_type"),
    )


def binarize_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic image corpus: one deterministic PPM (P6) payload per
    document (dims and pixels are pure functions of doc_id), encoded
    worker-side in Arrow batches.  Gives the REAL image decode path a
    corpus to run against without media files in the test data."""
    docs = load(spark, sf_dir, "documents").select("doc_id")

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                h, w = 3 + d % 7, 4 + d % 13
                px = (
                    (d * 31 + np.arange(h * w * 3)) % 256
                ).astype(np.uint8).reshape(h, w, 3)
                payloads.append(encode_ppm(px))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": payloads,
                "n_bytes": [len(p) for p in payloads],
                "media_type": [PPM_MEDIA_TYPE] * len(payloads),
            })

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("media_type", StringType()),
    ])
    return docs.mapInPandas(_gen, schema)


def binarize_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic audio corpus: one deterministic 16-bit PCM WAV per
    document (frequency, length, channel count and rate are pure
    functions of doc_id), encoded worker-side in Arrow batches — the
    REAL audio decode path's corpus, mirroring ``binarize_images``."""
    docs = load(spark, sf_dir, "documents").select("doc_id")

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                rate = 8000
                n = 400 + d % 800
                ch = 1 + d % 2
                t = np.arange(n) / rate
                freq = 100.0 + (d % 37) * 20.0
                wave = np.sin(2 * np.pi * freq * t)
                if ch == 2:
                    wave = np.stack([wave, np.roll(wave, d % 50)], axis=1)
                payloads.append(encode_wav(
                    (wave * 12000).astype("int16"), rate))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": payloads,
                "n_bytes": [len(p) for p in payloads],
                "media_type": [WAV_MEDIA_TYPE] * len(payloads),
            })

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("media_type", StringType()),
    ])
    return docs.mapInPandas(_gen, schema)


FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("mean_byte", DoubleType()),
    StructField("head_bytes", ArrayType(LongType())),
    StructField("media_type", StringType()),
    # image-only fields (null for non-image media): REAL decoded values
    StructField("img_width", LongType()),
    StructField("img_height", LongType()),
    StructField("mean_pixel", DoubleType()),
    # audio-only fields (null for non-audio media): REAL decoded values
    StructField("audio_rate", LongType()),
    StructField("audio_seconds", DoubleType()),
    StructField("audio_rms", DoubleType()),
    StructField("audio_zcr", DoubleType()),
])


def decode_stub(payload: bytes, media_type: str) -> dict:
    """Byte-level features for text media plus REAL decodes for the
    pure-Python formats (PPM/BMP -> width/height/mean pixel; PCM WAV
    -> rate/duration/RMS/zero-crossings).  Media needing native codecs
    (JPEG/PNG/MP3/video) raises — that boundary is where a real
    deployment plugs PIL/librosa/ffmpeg in."""
    out = {
        "n_bytes": len(payload),
        "mean_byte": (sum(payload) / len(payload)) if payload else 0.0,
        "head_bytes": list(payload[:8]),
        "img_width": None,
        "img_height": None,
        "mean_pixel": None,
        "audio_rate": None,
        "audio_seconds": None,
        "audio_rms": None,
        "audio_zcr": None,
    }
    if media_type in (PPM_MEDIA_TYPE, BMP_MEDIA_TYPE):
        img = decode_image(payload, media_type)
        out["img_width"] = int(img.shape[1])
        out["img_height"] = int(img.shape[0])
        out["mean_pixel"] = float(img.mean())
    elif media_type == WAV_MEDIA_TYPE:
        out.update(audio_features(payload))
    elif media_type.startswith(("image/", "audio/", "video/")):
        raise NotImplementedError(
            f"media codec for {media_type} not available in this environment"
        )
    return out


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.  The
    UDF boundary is per-partition ``mapInPandas`` — batch shape
    (pandas DataFrame of payload bytes), not per-row Python calls.
    The closure ships by value (module registered with
    register_pickle_by_value above), so it may call the module-level
    codecs even on workers without this repo on PYTHONPATH."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_stub(p, m)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": [f["n_bytes"] for f in feats],
                "mean_byte": [f["mean_byte"] for f in feats],
                "head_bytes": [f["head_bytes"] for f in feats],
                "media_type": pdf["media_type"],
                # nullable extension dtypes: None must reach Arrow as
                # null, not NaN (plain object->float64 would make the
                # int columns unconvertible to LongType)
                "img_width": pd.array(
                    [f["img_width"] for f in feats], dtype="Int64"
                ),
                "img_height": pd.array(
                    [f["img_height"] for f in feats], dtype="Int64"
                ),
                "mean_pixel": pd.array(
                    [f["mean_pixel"] for f in feats], dtype="Float64"
                ),
                "audio_rate": pd.array(
                    [f["audio_rate"] for f in feats], dtype="Int64"
                ),
                "audio_seconds": pd.array(
                    [f["audio_seconds"] for f in feats], dtype="Float64"
                ),
                "audio_rms": pd.array(
                    [f["audio_rms"] for f in feats], dtype="Float64"
                ),
                "audio_zcr": pd.array(
                    [f["audio_zcr"] for f in feats], dtype="Float64"
                ),
            })

    return df.mapInPandas(_extract, FEATURE_SCHEMA)


def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable metadata slice of the multimodal table."""
    return binarize_documents(spark, sf_dir).select(
        "doc_id", "n_bytes", "content_sha256", "media_type"
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end binary pipeline over all THREE media kinds: text
    payloads (byte-level features), synthetic PPM images
    (width/height/mean-pixel from the REAL image decoder), and
    synthetic PCM WAVs (rate/duration/RMS/zero-crossings from the REAL
    audio decoder).  Deterministic, so repeat runs hash identically."""
    feats = extract_features(
        binarize_documents(spark, sf_dir).select(
            "doc_id", "payload", "media_type"
        ).unionByName(
            binarize_images(spark, sf_dir).select(
                "doc_id", "payload", "media_type"
            )
        ).unionByName(
            binarize_audio(spark, sf_dir).select(
                "doc_id", "payload", "media_type"
            )
        )
    )
    return feats.select(
        "doc_id", "media_type", "n_bytes", "mean_byte",
        F.expr("head_bytes[0]").alias("first_byte"),
        "img_width", "img_height", "mean_pixel",
        "audio_rate", "audio_seconds", "audio_rms", "audio_zcr",
    )


RESIZED_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("payload", BinaryType()),
    StructField("n_bytes", LongType()),
    StructField("media_type", StringType()),
])


def resize_stub(
    payload: bytes, media_type: str, target_bytes: int,
    target_dims: tuple[int, int] = (8, 8),
) -> bytes:
    """Resample one payload.  PPM/BMP: REAL nearest-neighbor resize to
    ``target_dims`` (re-encoded as PPM).  Text: truncate/zero-pad to
    ``target_bytes``.  Native-codec media raises — swap in
    PIL.Image.resize / librosa.resample there; the Spark-side contract
    (binary in, binary out, bounded batch memory) is identical."""
    if media_type in (PPM_MEDIA_TYPE, BMP_MEDIA_TYPE):
        img = decode_image(payload, media_type)
        return encode_ppm(nn_resize(img, target_dims[0], target_dims[1]))
    if media_type == WAV_MEDIA_TYPE:
        # REAL audio resample: nearest-neighbor to target_bytes frames
        # (the time-axis analogue of the image path), re-encoded PCM
        samples, rate = decode_wav(payload)
        return encode_wav(nn_resample(samples, target_bytes), rate)
    if media_type.startswith(("image/", "audio/", "video/")):
        raise NotImplementedError(
            f"media codec for {media_type} not available in this environment"
        )
    if len(payload) >= target_bytes:
        return bytes(payload[:target_bytes])
    return bytes(payload) + b"\x00" * (target_bytes - len(payload))


def resize_payloads(
    df: DataFrame, target_bytes: int = 64, target_dims: tuple[int, int] = (8, 8)
) -> DataFrame:
    """Arrow-batched resize over the binary column via mapInPandas
    (one Python worker per partition; no driver involvement).  Image
    payloads (PPM/BMP) go through the real decode -> nearest-neighbor
    -> re-encode path; resized images come back as PPM."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                resize_stub(p, m, target_bytes, target_dims)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": resized,
                "n_bytes": [len(r) for r in resized],
                "media_type": [
                    PPM_MEDIA_TYPE
                    if m in (PPM_MEDIA_TYPE, BMP_MEDIA_TYPE) else m
                    for m in pdf["media_type"]
                ],
            })

    return df.mapInPandas(_resize, RESIZED_SCHEMA)


# ---------------------------------------------------------------------------
# pure-numpy video codec: YUV4MPEG2 (y4m), C444 — real, not a stub.
# y4m is raw planes behind text headers (the format ffmpeg pipes), so a
# full decode needs nothing but numpy; compressed video (H.264/VP9/...)
# remains the documented native-lib boundary in decode_stub/resize_stub.
# ---------------------------------------------------------------------------

Y4M_MEDIA_TYPE = "video/x-yuv4mpeg"


def encode_y4m(frames, fps: int = 25) -> bytes:
    """(n_frames, h, w, 3) uint8 planes -> YUV4MPEG2 C444 bytes:
    stream header, then per frame ``FRAME\\n`` + the three raw planes
    (plane-major, as the spec requires)."""
    import numpy as np

    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim != 4 or arr.shape[3] != 3 or 0 in arr.shape:
        raise ValueError(f"expected (n, h, w, 3) uint8, got {arr.shape}")
    n, h, w, _ = arr.shape
    out = [f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C444\n".encode("ascii")]
    for f in range(n):
        out.append(b"FRAME\n")
        # interleaved (h, w, 3) -> plane-major Y, Cb, Cr
        out.append(np.ascontiguousarray(
            arr[f].transpose(2, 0, 1)).tobytes())
    return b"".join(out)


def decode_y4m(payload: bytes):
    """YUV4MPEG2 C444 bytes -> ((n_frames, h, w, 3) uint8, fps)."""
    import numpy as np

    nl = payload.index(b"\n")
    head = payload[:nl].decode("ascii", "replace").split(" ")
    if head[0] != "YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = fps = None
    for tag in head[1:]:
        if tag.startswith("W"):
            w = int(tag[1:])
        elif tag.startswith("H"):
            h = int(tag[1:])
        elif tag.startswith("F"):
            fps = int(tag[1:].split(":")[0])
        elif tag.startswith("C") and tag not in ("C444",):
            raise ValueError(f"unsupported y4m colourspace {tag}")
    if not w or not h or not fps:
        raise ValueError(f"missing W/H/F in y4m header: {head}")
    frame_bytes = 3 * h * w
    frames, pos = [], nl + 1
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if not payload[pos:fnl].startswith(b"FRAME"):
            raise ValueError("corrupt y4m: FRAME marker missing")
        start = fnl + 1
        planes = np.frombuffer(
            payload[start:start + frame_bytes], dtype=np.uint8)
        if planes.size != frame_bytes:
            raise ValueError("truncated y4m frame")
        frames.append(planes.reshape(3, h, w).transpose(1, 2, 0))
        pos = start + frame_bytes
    return np.stack(frames), fps


def binarize_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic video corpus: one deterministic y4m clip per document
    (frame count, dims and pixels are pure functions of doc_id),
    encoded worker-side in Arrow batches — the REAL video decode
    path's corpus, mirroring ``binarize_images``/``binarize_audio``.
    The generation contract (n = 2 + d%5, h = 4 + d%5, w = 4 + d%7,
    pixel = (d*31 + f*7 + idx) % 256, fps 25) is what the driver
    oracle recomputes in closed form."""
    docs = load(spark, sf_dir, "documents").select("doc_id")

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                n, h, w = 2 + d % 5, 4 + d % 5, 4 + d % 7
                idx = np.arange(h * w * 3).reshape(h, w, 3)
                clip = np.stack([
                    ((d * 31 + f * 7 + idx) % 256).astype(np.uint8)
                    for f in range(n)
                ])
                payloads.append(encode_y4m(clip))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": payloads,
                "n_bytes": [len(p) for p in payloads],
                "media_type": [Y4M_MEDIA_TYPE] * len(payloads),
            })

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("media_type", StringType()),
    ])
    return docs.mapInPandas(_gen, schema)


def frame_sample_video(
    df: DataFrame, every_n: int = 2, max_frames: int = 3
) -> DataFrame:
    """REAL frame sampling: decode each y4m payload, keep every
    ``every_n``-th frame up to ``max_frames``, and emit each sampled
    frame re-encoded as a standalone PPM image row — the
    video -> training-image extraction step, Arrow-batched with
    bounded memory (one clip decoded at a time per worker)."""
    if every_n < 1 or max_frames < 1:
        raise ValueError(f"every_n={every_n}/max_frames={max_frames} "
                         "must be >= 1")

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "payload": [],
                    "img_height": [], "img_width": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                clip, _fps = decode_y4m(bytes(payload))
                for k, fi in enumerate(range(0, clip.shape[0], every_n)):
                    if k >= max_frames:
                        break
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(fi)
                    rows["payload"].append(encode_ppm(clip[fi]))
                    rows["img_height"].append(clip.shape[1])
                    rows["img_width"].append(clip.shape[2])
            yield pd.DataFrame(rows)

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("payload", BinaryType()),
        StructField("img_height", LongType()),
        StructField("img_width", LongType()),
    ])
    return df.mapInPandas(_sample, schema)


def video_features(df: DataFrame) -> DataFrame:
    """Per-clip structural + motion features from a REAL decode:
    ``(doc_id, n_frames, width, height, fps, duration_s, motion)``
    where motion is the mean absolute inter-frame pixel delta (0 for
    single-frame clips)."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {"doc_id": [], "n_frames": [], "width": [],
                    "height": [], "fps": [], "duration_s": [],
                    "motion": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                clip, fps = decode_y4m(bytes(payload))
                n, h, w, _ = clip.shape
                motion = 0.0
                if n > 1:
                    deltas = np.abs(
                        clip[1:].astype(np.int16)
                        - clip[:-1].astype(np.int16))
                    motion = float(deltas.mean())
                rows["doc_id"].append(doc_id)
                rows["n_frames"].append(n)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["fps"].append(fps)
                rows["duration_s"].append(n / float(fps))
                rows["motion"].append(motion)
            yield pd.DataFrame(rows)

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("n_frames", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("fps", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("motion", DoubleType()),
    ])
    return df.mapInPandas(_feat, schema)


def frame_sample_plan(
    df: DataFrame, every_n_bytes: int = 64, max_frames: int = 4
) -> DataFrame:
    """'Frame sampling' over the opaque payload: take a byte every
    ``every_n_bytes`` as a stand-in for video frame extraction —
    demonstrates slicing binary columns without leaving the JVM."""
    # upper bound floor((n_bytes - 1) / n): int(n_bytes / n) sampled one
    # byte past the end when n_bytes was an exact multiple (phantom
    # empty frame), and an empty payload must yield zero frames
    return df.select(
        "doc_id",
        F.expr(
            f"CASE WHEN n_bytes <= 0 THEN array() ELSE "
            f"transform(sequence(0, least(int((n_bytes - 1) / {every_n_bytes}), "
            f"{max_frames - 1})), i -> substring(payload, i * {every_n_bytes} + 1, 1)) "
            f"END"
        ).alias("frames"),
    ).withColumn("n_frames", F.size("frames"))
