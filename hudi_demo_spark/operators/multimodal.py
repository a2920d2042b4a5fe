"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested: schema, partition-friendly
batch shapes, Arrow-batched `mapInPandas` UDF signatures. Decoding is
REAL in pure numpy, no codec libraries: binary PPM (8- and 16-bit) and
uncompressed 24-bit BMP images, PCM WAV audio, Y4M video frames, plus
the full JPEG (baseline + progressive + lossless, operators/jpeg.py),
PNG (operators/png.py) and GIF (operators/gif.py) decoders. Codecs
that genuinely need external libraries (MP3/H.264) remain an honest
NotImplementedError; `fake=True` keeps the deterministic digest
pseudo-decode for oracle-stable plumbing tests.

Design for 100 TB: binary payloads stay in parquet binary columns (never
collect, never base64 through the driver); decode/feature-extract runs in
`mapInPandas` so each Arrow batch is processed vectorized per partition;
metadata (width/height/codec/duration) lives in plain columns so filters
prune before any decode happens.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Turn a text table into a media table for plumbing tests: payload =
    utf-8 bytes of the text, metadata derived deterministically."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (F.pmod(F.crc32(F.encode(F.col(text_col), "utf-8")), F.lit(1920)) + 1)
        .cast("int")
        .alias("width"),
        (F.pmod(F.crc32(F.encode(F.col(text_col), "utf-8")), F.lit(1080)) + 1)
        .cast("int")
        .alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def sniff(payload: bytes | None) -> str | None:
    """Container type from magic bytes:
    'ppm' | 'bmp' | 'wav' | 'jpeg' | 'png' | 'gif' | None."""
    if not payload or len(payload) < 12:
        return None
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:9] == b"YUV4MPEG2":
        return "y4m"
    return None


def encode_ppm(arr, maxval: int = 255) -> bytes:
    """(h, w, 3) → binary PPM (P6). Test-fixture encoder; maxval > 255
    emits the spec's 2-byte big-endian samples (16-bit PPM)."""
    import numpy as np

    if maxval > 255:
        a = np.asarray(arr, dtype=np.uint16)
        h, w, _ = a.shape
        body = a.astype(">u2").tobytes()
    else:
        a = np.asarray(arr, dtype=np.uint8)
        h, w, _ = a.shape
        body = a.tobytes()
    return b"P6\n%d %d\n%d\n" % (w, h, maxval) + body


def decode_ppm(payload: bytes) -> dict:
    """Binary PPM (P6): header is whitespace-separated tokens with '#'
    comments; pixels are raw RGB — 1 byte per sample for maxval ≤ 255,
    2 bytes big-endian for maxval up to 65535 (the spec's 16-bit
    form, used by scanners/HDR pipelines). 16-bit decodes to uint16
    with `maxval` recorded so callers can normalize."""
    import numpy as np

    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if not 0 < maxval < 65536:
        raise ValueError(f"PPM maxval out of range: {maxval}")
    if maxval > 255:
        px = np.frombuffer(payload, dtype=">u2", count=w * h * 3, offset=pos)
        return {"kind": "image", "width": w, "height": h, "maxval": maxval,
                "pixels": px.astype(np.uint16).reshape(h, w, 3)}
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return {"kind": "image", "width": w, "height": h, "maxval": maxval,
            "pixels": px.reshape(h, w, 3)}


def decode_bmp(payload: bytes) -> dict:
    """Uncompressed 24-bit BMP (BI_RGB): bottom-up BGR rows padded to
    4 bytes; negative height means top-down."""
    import struct

    import numpy as np

    off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={comp}")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return {"kind": "image", "width": w, "height": h,
            "pixels": rows[:, :, ::-1]}  # BGR → RGB


def encode_wav(samples, sample_rate: int = 16000) -> bytes:
    """int16 samples, shape (n,) mono or (n, ch) → PCM WAV bytes."""
    import struct

    import numpy as np

    a = np.asarray(samples, dtype="<i2")
    if a.ndim == 1:
        a = a[:, None]
    n_ch = a.shape[1]
    data = a.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, sample_rate * n_ch * 2, n_ch * 2, 16
    )
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_wav(payload: bytes) -> dict:
    """PCM WAV (8/16-bit): walk RIFF chunks for fmt + data; samples via
    numpy frombuffer (vectorized, no per-sample Python)."""
    import struct

    import numpy as np

    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if audio_fmt != 1 or bits not in (8, 16):
        raise NotImplementedError(f"WAV format={audio_fmt} bits={bits}")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    else:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128) / 128.0
    n = len(x) // n_ch
    x = x[: n * n_ch].reshape(n, n_ch)
    return {"kind": "audio", "n_channels": n_ch, "sample_rate": rate,
            "n_samples": n, "duration_ms": int(n * 1000 / rate),
            "samples": x}


def encode_y4m(frames, fps: int = 25, colorspace: str = "mono") -> bytes:
    """uint8 frames → Y4M (YUV4MPEG2) bytes. Test-fixture encoder.

    `mono`: frames (n, h, w) gray — stored losslessly (the algebraic
    gate's path: a brightness offset stays an exact DC offset).
    `444`: frames (n, h, w, 3) RGB — full-range BT.601 conversion.
    `420`: same input, chroma subsampled 2×2 (even dims required)."""
    import numpy as np

    a = np.asarray(frames, dtype=np.uint8)
    if colorspace == "mono":
        if a.ndim != 3:
            raise ValueError("mono expects (n, h, w)")
        n, h, w = a.shape
        planes = [f.tobytes() for f in a]
    elif colorspace in ("444", "420"):
        if a.ndim != 4 or a.shape[3] != 3:
            raise ValueError("444/420 expect (n, h, w, 3)")
        n, h, w, _ = a.shape
        rgb = a.astype(np.float64)
        y = rgb @ np.array([0.299, 0.587, 0.114])
        u = 128.0 + rgb @ np.array([-0.168736, -0.331264, 0.5])
        v = 128.0 + rgb @ np.array([0.5, -0.418688, -0.081312])
        y, u, v = (np.clip(np.rint(p), 0, 255).astype(np.uint8)
                   for p in (y, u, v))
        if colorspace == "420":
            if h % 2 or w % 2:
                raise ValueError("420 needs even dimensions")
            u = u[:, ::2, ::2]
            v = v[:, ::2, ::2]
        planes = [
            y[i].tobytes() + u[i].tobytes() + v[i].tobytes()
            for i in range(n)
        ]
    else:
        raise ValueError(f"unsupported colorspace: {colorspace}")
    cs = {"mono": "mono", "444": "444", "420": "420"}[colorspace]
    head = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C{cs}\n".encode()
    return head + b"".join(b"FRAME\n" + p for p in planes)


def decode_y4m(payload: bytes) -> dict:
    """Y4M (YUV4MPEG2) → {'kind': 'video', width, height, fps,
    n_frames, duration_ms, frames: uint8 (n, h, w, 3)} — the one video
    container that needs no codec library (raw frames behind a text
    header). Handles Cmono (gray, replicated to RGB), C444 and the
    C420 family (nearest-neighbor chroma upsample); full-range BT.601
    inverse. All plane math is vectorized numpy over the whole frame
    stack — no per-pixel Python."""
    import numpy as np

    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a Y4M stream")
    w = h = 0
    fps = 25.0
    cs = "420"
    for tok in payload[9:nl].split():
        t = tok.decode("ascii", "replace")
        if t[0] == "W":
            w = int(t[1:])
        elif t[0] == "H":
            h = int(t[1:])
        elif t[0] == "F":
            num, den = t[1:].split(":")
            fps = int(num) / int(den)
        elif t[0] == "C":
            cs = t[1:]
    if w <= 0 or h <= 0:
        raise ValueError("Y4M header missing W/H")
    if cs == "mono":
        frame_len = w * h
    elif cs == "444":
        frame_len = 3 * w * h
    elif cs.startswith("420"):
        if h % 2 or w % 2:
            raise ValueError("C420 with odd dimensions")
        frame_len = w * h + 2 * ((w // 2) * (h // 2))
    else:
        raise NotImplementedError(f"Y4M colorspace C{cs}")
    pos = nl + 1
    raw = []
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos : pos + 5] != b"FRAME":
            raise ValueError("malformed Y4M FRAME header")
        body = payload[fnl + 1 : fnl + 1 + frame_len]
        if len(body) != frame_len:
            raise ValueError("truncated Y4M frame")
        raw.append(np.frombuffer(body, dtype=np.uint8))
        pos = fnl + 1 + frame_len
    if not raw:
        raise ValueError("Y4M contains no frames")
    stack = np.stack(raw).astype(np.float64)
    n = len(raw)
    if cs == "mono":
        y = stack.reshape(n, h, w)
        rgb = np.repeat(y[..., None], 3, axis=3)
    else:
        if cs == "444":
            y = stack[:, : w * h].reshape(n, h, w)
            u = stack[:, w * h : 2 * w * h].reshape(n, h, w)
            v = stack[:, 2 * w * h :].reshape(n, h, w)
        else:
            cw, ch_ = w // 2, h // 2
            y = stack[:, : w * h].reshape(n, h, w)
            u = stack[:, w * h : w * h + cw * ch_].reshape(n, ch_, cw)
            v = stack[:, w * h + cw * ch_ :].reshape(n, ch_, cw)
            u = u.repeat(2, axis=1).repeat(2, axis=2)
            v = v.repeat(2, axis=1).repeat(2, axis=2)
        r = y + 1.402 * (v - 128.0)
        g = y - 0.344136 * (u - 128.0) - 0.714136 * (v - 128.0)
        b = y + 1.772 * (u - 128.0)
        rgb = np.stack([r, g, b], axis=3)
    frames = np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
    return {
        "kind": "video", "width": w, "height": h, "fps": fps,
        "n_frames": n, "duration_ms": int(n * 1000 / fps),
        "frames": frames,
    }


def decode_media(payload: bytes) -> dict:
    """Dispatch on magic bytes → decoded dict (see decode_ppm /
    decode_bmp / decode_wav / jpeg.decode_jpeg / png.decode_png —
    baseline JFIF and PNG decode for REAL in pure numpy + stdlib
    zlib). Unknown containers raise — the honest stub is retained only
    for codecs that genuinely need libraries (MP3/H.264...)."""
    k = sniff(payload)
    if k == "ppm":
        return decode_ppm(payload)
    if k == "bmp":
        return decode_bmp(payload)
    if k == "wav":
        return decode_wav(payload)
    if k == "jpeg":
        from hudi_demo_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if k == "png":
        from hudi_demo_spark.operators.png import decode_png

        return decode_png(payload)
    if k == "gif":
        from hudi_demo_spark.operators.gif import decode_gif

        return decode_gif(payload)
    if k == "y4m":
        return decode_y4m(payload)
    raise NotImplementedError(
        "unknown container: only PPM/BMP/WAV/Y4M/JPEG/PNG/GIF "
        "decode without codec libraries; pass fake=True for the "
        "deterministic test double"
    )


def decode_image(payload: bytes, fake: bool = False):
    """Feature extraction for one payload. `fake=True` keeps the
    original deterministic 4-float digest pseudo-decode (stable across
    runs — the oracle-checked plumbing path). Otherwise PPM/BMP/WAV
    decode for REAL (pure numpy, no codec libs): images yield
    [width, height, mean_r, mean_g, mean_b, std_luma]; audio yields
    [n_channels, sample_rate, n_samples, rms, peak, zero_crossings]."""
    if fake:
        d = hashlib.sha256(payload or b"").digest()
        return [b / 255.0 for b in d[:4]]
    import numpy as np

    m = decode_media(payload)
    if m["kind"] == "image":
        px = m["pixels"].astype(np.float64)
        luma = px @ np.array([0.2126, 0.7152, 0.0722])
        return [
            float(m["width"]), float(m["height"]),
            float(px[:, :, 0].mean()), float(px[:, :, 1].mean()),
            float(px[:, :, 2].mean()), float(luma.std()),
        ]
    x = m["samples"]
    mono = x.mean(axis=1)
    zc = int(((mono[:-1] * mono[1:]) < 0).sum())
    return [
        float(m["n_channels"]), float(m["sample_rate"]),
        float(m["n_samples"]),
        float(np.sqrt((mono ** 2).mean())) if len(mono) else 0.0,
        float(np.abs(mono).max()) if len(mono) else 0.0,
        float(zc),
    ]


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched, per-partition, no
    driver involvement. Output matches FEATURE_SCHEMA."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feature": payloads.map(lambda b: decode_image(b, fake=fake)),
                }
            )

    from hudi_demo_spark.operators.util import spread

    narrow = media.select("media_id", "payload")
    # fan a single input split out before the Python stage (no-op at scale)
    return spread(narrow).mapInPandas(_extract, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms)
    via sequence+explode — the decode of each frame is the stubbed step.
    The expansion happens executor-side (no driver loop)."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms)
                )
            ).alias("frame_ts_ms"),
        )
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("orig_w", T.IntegerType()),
        T.StructField("orig_h", T.IntegerType()),
        T.StructField("new_w", T.IntegerType()),
        T.StructField("new_h", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def phash64(payload: bytes) -> int:
    """64-bit perceptual hash (pHash, the classic DCT image
    fingerprint): decode → luma → 32×32 nearest-neighbor resample →
    orthonormal 2-D DCT-II (pure-numpy basis matmul, no scipy) →
    top-left 8×8 low-frequency block minus the DC term → each
    coefficient hashes to its sign vs the block median. Robust to
    resizing/re-encoding/small edits; Hamming distance between hashes
    tracks perceptual difference. Returned as a SIGNED 64-bit int
    (two's complement) so it rides a Spark `long` column directly."""
    m = decode_media(payload)
    if m["kind"] != "image":
        raise ValueError("phash64: payload is not an image")
    return _phash_pixels(m["pixels"], m["width"], m["height"])


def _phash_pixels(pixels, width: int, height: int) -> int:
    """pHash core over already-decoded uint8 (h, w, 3) pixels — shared
    by the image path (phash64) and the per-frame video path so the
    two can never drift."""
    import numpy as np

    px = np.asarray(pixels).astype(np.float64)
    luma = px @ np.array([0.2126, 0.7152, 0.0722])
    n = 32
    yi = np.arange(n) * height // n
    xi = np.arange(n) * width // n
    g = luma[yi][:, xi]
    k = np.arange(n)[:, None]
    basis = np.cos(np.pi * (2 * np.arange(n)[None, :] + 1) * k / (2 * n))
    basis *= np.where(k == 0, np.sqrt(1.0 / n), np.sqrt(2.0 / n))
    coef = basis @ g @ basis.T
    block = coef[:8, :8].ravel()[1:]  # 63 AC coefficients, DC dropped
    bits = block > np.median(block)
    h = 0
    for b in bits:
        h = (h << 1) | int(b)
    h <<= 1  # pad to 64 bits (63 AC bits + one zero)
    return h - (1 << 64) if h >= (1 << 63) else h


def phash_media(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(id, phash long) over an image payload column — one Arrow-batched
    mapInPandas pass (decode + DCT are vectorized numpy per payload;
    python cost ∝ pixels, zero shuffle). Rows whose payload is missing
    or not a decodable image yield NULL and are dropped: a fingerprint
    that silently hashed garbage would create false dedup pairs."""
    from hudi_demo_spark.operators.util import spread as _spread

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_ids, out_hashes = [], []
        for pdf in batches:
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                try:
                    out_hashes.append(phash64(b))
                    out_ids.append(i)
                except Exception:
                    continue
            yield pd.DataFrame({id_col: out_ids, "phash": out_hashes})
            out_ids, out_hashes = [], []

    return _spread(media.select(id_col, payload_col)).mapInPandas(
        _hash, f"{id_col} long, phash long"
    )


def phash_near_pairs(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_hamming: int = 7,
    band_bits: int = 8,
) -> DataFrame:
    """Image near-dup pairs (a, b, hamming ≤ max_hamming) by perceptual
    hash — the image-side member of the dedup family: pHash map-side,
    then the shared pigeonhole chunk blocking + bit_count(xor) verify
    (`dedup.hamming_near_pairs`). No crossJoin at any corpus size.
    Completeness guaranteed only for max_hamming < 64/band_bits (8
    chunks at the default band_bits=8 → exact through Hamming 7); a
    wider max_hamming trades recall — pairs differing in every chunk
    are missed — unless band_bits shrinks to restore the bound."""
    from hudi_demo_spark.operators.dedup import hamming_near_pairs

    sigs = phash_media(media, id_col, payload_col).persist()
    return hamming_near_pairs(
        sigs, id_col, "phash", max_hamming=max_hamming,
        band_bits=band_bits,
    )


def video_frames(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    every_n: int = 1,
    max_frames: int | None = None,
) -> DataFrame:
    """(id, frame_idx, width, height, payload): sampled video frames as
    standalone PPM image payloads — the decode step frame_sample_plan
    stubs, real for Y4M. One Arrow-batched `mapInPandas` pass; each
    video decodes once and emits only every `every_n`-th frame (capped
    at `max_frames`), so downstream image operators (pHash, resize,
    feature extraction) compose unchanged on the frame rows. Rows that
    fail to decode as video are dropped, mirroring phash_media."""
    from hudi_demo_spark.operators.util import spread as _spread

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ws, hs, payloads = [], [], [], [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                try:
                    m = decode_media(bytes(b))
                    if m["kind"] != "video":
                        continue
                except Exception:
                    continue
                sel = range(0, m["n_frames"], every_n)
                if max_frames is not None:
                    sel = list(sel)[:max_frames]
                for fi in sel:
                    ids.append(i)
                    idxs.append(fi)
                    ws.append(m["width"])
                    hs.append(m["height"])
                    payloads.append(encode_ppm(m["frames"][fi]))
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "width": ws,
                 "height": hs, "payload": payloads}
            )

    return _spread(media.select(id_col, payload_col)).mapInPandas(
        _sample,
        f"{id_col} long, frame_idx int, width int, height int, "
        "payload binary",
    )


def video_phashes(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    every_n: int = 1,
    max_frames: int | None = None,
) -> DataFrame:
    """(id, frame_idx, phash): per-sampled-frame perceptual hash in ONE
    decode pass (no PPM re-encode round trip — frames hash straight
    from the decoded stack via the shared _phash_pixels core). The
    video-side signature table for frame-aligned near-dup mining."""
    from hudi_demo_spark.operators.util import spread as _spread

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                try:
                    m = decode_media(bytes(b))
                    if m["kind"] != "video":
                        continue
                except Exception:
                    continue
                sel = range(0, m["n_frames"], every_n)
                if max_frames is not None:
                    sel = list(sel)[:max_frames]
                for fi in sel:
                    ids.append(i)
                    idxs.append(fi)
                    hashes.append(
                        _phash_pixels(
                            m["frames"][fi], m["width"], m["height"]
                        )
                    )
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "phash": hashes}
            )

    return _spread(media.select(id_col, payload_col)).mapInPandas(
        _hash, f"{id_col} long, frame_idx int, phash long"
    )


def video_near_dups(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    every_n: int = 1,
    max_frames: int | None = None,
    max_hamming: int = 7,
    band_bits: int = 8,
    min_frame_frac: float = 0.8,
) -> DataFrame:
    """Video near-dup pairs (a, b, n_matched, n_compared): two videos
    are near-duplicates when >= `min_frame_frac` of their aligned
    sampled frames pair within `max_hamming` perceptual-hash bits.

    Scale shape: per-frame pHashes (one decode pass) feed the shared
    pigeonhole Hamming miner with the frame index as a blocking GROUP
    column — candidates only form between same-position frames, so the
    join buckets shrink with video length instead of growing the
    candidate set. The per-pair match count aggregates map-side;
    n_compared = the smaller video's sampled-frame count (asymmetric
    lengths can still pair on their shared prefix)."""
    from hudi_demo_spark.operators.dedup import hamming_near_pairs

    sigs = video_phashes(
        media, id_col, payload_col, every_n=every_n, max_frames=max_frames
    ).persist()
    counts = sigs.groupBy(id_col).agg(F.count("*").alias("__nf"))
    pairs = hamming_near_pairs(
        sigs, id_col, "phash", max_hamming=max_hamming,
        band_bits=band_bits, group_cols=["frame_idx"],
    )
    matched = pairs.groupBy("a", "b").agg(
        F.count("*").cast("long").alias("n_matched")
    )
    ca = counts.select(
        F.col(id_col).alias("a"), F.col("__nf").alias("__na")
    )
    cb = counts.select(
        F.col(id_col).alias("b"), F.col("__nf").alias("__nb")
    )
    return (
        matched.join(ca, "a").join(cb, "b")
        .withColumn(
            "n_compared", F.least("__na", "__nb").cast("long")
        )
        .filter(
            F.col("n_matched")
            >= F.lit(min_frame_frac) * F.col("n_compared")
        )
        .select("a", "b", "n_matched", "n_compared")
    )


def afp64(payload: bytes, n_fft: int = 2048, bands: int = 63) -> int:
    """64-bit audio fingerprint (spectral-band signature, the
    chromaprint-family shape): decode WAV → mono → nearest resample to
    `n_fft` samples → magnitude spectrum (pure-numpy real-DFT matmul,
    no scipy) → `bands` log-spaced band energies → each band hashes to
    its sign vs the band-energy median. Amplitude/volume changes scale
    every band equally, so the fingerprint is gain-invariant; Hamming
    distance tracks spectral difference. Signed 64-bit int (rides a
    Spark `long`)."""
    import numpy as np

    m = decode_media(payload)
    if m["kind"] != "audio":
        raise ValueError("afp64: payload is not audio")
    x = m["samples"].astype(np.float64).mean(axis=1)
    if len(x) == 0:
        raise ValueError("afp64: empty audio")
    idx = np.arange(n_fft) * len(x) // n_fft
    g = x[idx]
    n = n_fft
    k = np.arange(1, n // 2)[:, None]  # skip DC; real spectrum
    ang = 2 * np.pi * k * np.arange(n)[None, :] / n
    mag = np.hypot(np.cos(ang) @ g, np.sin(ang) @ g)
    edges = np.unique(
        np.geomspace(1, len(mag), bands + 2).astype(int)
    )
    # band MEANS, not sums — a sum encodes log-band WIDTH, which is the
    # same for every signal (flat-spectrum inputs would all collide);
    # each bit is the sign of an ADJACENT-band delta (the chromaprint
    # family's spectral-shape code), so gain scales both sides equally
    # and the signature depends only on spectral shape
    band_e = np.array([
        mag[a:b].mean() if b > a else 0.0
        for a, b in zip(edges[:-1], edges[1:])
    ])
    if len(band_e) < bands + 1:  # tiny n_fft: pad deterministically
        band_e = np.pad(band_e, (0, bands + 1 - len(band_e)))
    bits = band_e[:-1] > band_e[1:]
    h = 0
    for b in bits[:63]:
        h = (h << 1) | int(b)
    h <<= 1
    return h - (1 << 64) if h >= (1 << 63) else h


def afp_media(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(id, afp long) over an audio payload column — Arrow-batched
    mapInPandas, zero shuffle; undecodable/non-audio rows drop (a
    fingerprint over garbage would fabricate dedup pairs)."""
    from hudi_demo_spark.operators.util import spread as _spread

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs = [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                try:
                    hs.append(afp64(b))
                    ids.append(i)
                except Exception:
                    continue
            yield pd.DataFrame({id_col: ids, "afp": hs})

    return _spread(media.select(id_col, payload_col)).mapInPandas(
        _hash, f"{id_col} long, afp long"
    )


def afp_near_pairs(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_hamming: int = 7,
    band_bits: int = 8,
) -> DataFrame:
    """Audio near-dup pairs (a, b, hamming ≤ max_hamming) — the audio
    member of the dedup family, sharing `dedup.hamming_near_pairs`'
    pigeonhole blocking with SimHash and pHash. No crossJoin.
    Complete only for max_hamming < 64/band_bits (Hamming ≤ 7 at the
    defaults); wider thresholds trade recall."""
    from hudi_demo_spark.operators.dedup import hamming_near_pairs

    sigs = afp_media(media, id_col, payload_col).persist()
    return hamming_near_pairs(
        sigs, id_col, "afp", max_hamming=max_hamming, band_bits=band_bits
    )


def _resize_pixels(payload: bytes, new_w: int, new_h: int) -> bytes:
    """Real nearest-neighbor downscale for PPM/BMP payloads (numpy
    index-gather, no per-pixel Python); output re-encoded as PPM."""
    import numpy as np

    m = decode_media(payload)
    px = m["pixels"]
    yi = np.arange(new_h) * m["height"] // new_h
    xi = np.arange(new_w) * m["width"] // new_w
    return encode_ppm(px[yi][:, xi])


def resize_media(
    media: DataFrame, max_w: int = 256, max_h: int = 256, fake: bool = True
) -> DataFrame:
    """Aspect-preserving resize over mapInPandas: the dimension math
    (fit into max_w × max_h, never upscale) is oracle-checked; with
    `fake=True` the payload passes through unchanged (oracle-stable
    plumbing path), with `fake=False` PPM/BMP pixels are REALLY
    resized (nearest-neighbor, pure numpy) and re-encoded as PPM."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL/non-positive dims (audio rows in a mixed-media table)
            # pass through with NULL output dims instead of NaN crashes
            valid = pdf["width"].notna() & pdf["height"].notna()
            valid &= (pdf["width"].fillna(0) > 0) & (pdf["height"].fillna(0) > 0)
            w = pdf["width"].where(valid, 1)
            h = pdf["height"].where(valid, 1)
            scale = (max_w / w).clip(upper=1.0).combine(
                (max_h / h).clip(upper=1.0), min
            )
            new_w = (w * scale).astype(int).where(valid).astype("Int32")
            new_h = (h * scale).astype(int).where(valid).astype("Int32")
            payload = pdf["payload"]
            if not fake:
                payload = pd.Series(
                    [
                        _resize_pixels(b, int(nw), int(nh))
                        if ok and b is not None
                        else b
                        for b, nw, nh, ok in zip(
                            payload, new_w.fillna(0), new_h.fillna(0), valid
                        )
                    ],
                    index=payload.index, dtype=object,
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "orig_w": pdf["width"].astype("Int32"),
                    "orig_h": pdf["height"].astype("Int32"),
                    "new_w": new_w,
                    "new_h": new_h,
                    "payload": payload,
                }
            )

    return media.select("media_id", "width", "height", "payload").mapInPandas(
        _resize, RESIZE_SCHEMA
    )
