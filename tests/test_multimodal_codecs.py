"""Real pure-Python multimodal decode (PPM / BMP / WAV): numpy
round-trip oracles for each container, end-to-end extract_features and
resize through mapInPandas with fake=False."""

import struct

import numpy as np
import pytest

from hudi_demo_spark.operators import multimodal as mm


def _rng(seed=7):
    return np.random.default_rng(seed)


def _bmp_bytes(px: np.ndarray, top_down: bool = False) -> bytes:
    """Minimal 24-bit BI_RGB BMP encoder (test fixture)."""
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    rows = px[:, :, ::-1]  # RGB → BGR
    if not top_down:
        rows = rows[::-1]
    body = b"".join(
        rows[y].tobytes() + b"\0" * (stride - w * 3) for y in range(h)
    )
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, 24, 0,
        len(body), 2835, 2835, 0, 0,
    )
    off = 14 + len(dib)
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    return hdr + dib + body


def test_ppm_roundtrip_bit_exact():
    px = _rng().integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    m = mm.decode_ppm(mm.encode_ppm(px))
    assert (m["width"], m["height"]) == (7, 5)
    assert np.array_equal(m["pixels"], px)
    # comments and multi-line headers parse
    manual = b"P6\n# a comment\n7\n# more\n5 255\n" + px.tobytes()
    assert np.array_equal(mm.decode_ppm(manual)["pixels"], px)


@pytest.mark.parametrize("top_down", [False, True])
def test_bmp_roundtrip_bit_exact(top_down):
    px = _rng(3).integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    m = mm.decode_bmp(_bmp_bytes(px, top_down))
    assert (m["width"], m["height"]) == (6, 4)
    assert np.array_equal(m["pixels"], px)


def test_wav_roundtrip_and_features():
    rate = 8000
    t = np.arange(800)
    mono = (np.sin(2 * np.pi * 440 * t / rate) * 20000).astype(np.int16)
    m = mm.decode_wav(mm.encode_wav(mono, rate))
    assert (m["n_channels"], m["sample_rate"], m["n_samples"]) == (1, rate, 800)
    assert m["duration_ms"] == 100
    # numpy-differential oracle for the feature vector
    x = mono.astype(np.float64) / 32768.0
    feats = mm.decode_image(mm.encode_wav(mono, rate))
    assert feats[:3] == [1.0, float(rate), 800.0]
    assert feats[3] == pytest.approx(np.sqrt((x ** 2).mean()))
    assert feats[4] == pytest.approx(np.abs(x).max())
    assert feats[5] == float(((x[:-1] * x[1:]) < 0).sum())
    # stereo
    st = np.stack([mono, -mono], axis=1)
    m2 = mm.decode_wav(mm.encode_wav(st, rate))
    assert m2["n_channels"] == 2 and m2["n_samples"] == 800


def test_image_features_match_numpy():
    px = _rng(11).integers(0, 256, size=(8, 9, 3), dtype=np.uint8)
    feats = mm.decode_image(mm.encode_ppm(px))
    f = px.astype(np.float64)
    luma = f @ np.array([0.2126, 0.7152, 0.0722])
    assert feats[0:2] == [9.0, 8.0]
    for i, ch in enumerate(range(3)):
        assert feats[2 + i] == pytest.approx(f[:, :, ch].mean())
    assert feats[5] == pytest.approx(luma.std())


def test_unknown_container_still_raises():
    # MP3 frame sync — a container that genuinely needs a library
    with pytest.raises(NotImplementedError, match="unknown container"):
        mm.decode_image(b"\xff\xfb\x90\x64" + b"\0" * 32)
    # PNG is now a REAL decoder: a corrupt stream is a ValueError from
    # the codec, no longer an unknown-container stub
    with pytest.raises(ValueError, match="missing IHDR/IDAT"):
        mm.decode_image(b"\x89PNG\r\n\x1a\n" + b"\0" * 32)
    # and the fake path is unchanged (oracle stability)
    assert mm.decode_image(b"abc", fake=True) == mm.decode_image(
        b"abc", fake=True
    )


def test_extract_features_real_decode_e2e(spark):
    px = _rng(5).integers(0, 256, size=(3, 4, 3), dtype=np.uint8)
    wav = mm.encode_wav(
        (_rng(6).standard_normal(160) * 10000).astype(np.int16), 16000
    )
    rows = [
        (1, "image", bytearray(mm.encode_ppm(px)), "image/x-portable-pixmap",
         4, 3, None),
        (2, "image", bytearray(_bmp_bytes(px)), "image/bmp", 4, 3, None),
        (3, "audio", bytearray(wav), "audio/wav", None, None, 10),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in
           mm.extract_features(media, fake=False).collect()}
    assert len(got) == 3
    # PPM and BMP of the same pixels agree on every feature
    assert got[1]["feature"] == pytest.approx(got[2]["feature"])
    assert got[1]["feature"][0:2] == [4.0, 3.0]
    assert got[3]["feature"][0:2] == [1.0, 16000.0]
    oracle = mm.decode_image(wav)
    assert got[3]["feature"] == pytest.approx(oracle, rel=1e-6)


def test_resize_real_pixels_e2e(spark):
    px = _rng(9).integers(0, 256, size=(64, 128, 3), dtype=np.uint8)
    rows = [(1, "image", bytearray(mm.encode_ppm(px)),
             "image/x-portable-pixmap", 128, 64, None)]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    out = mm.resize_media(media, max_w=32, max_h=32, fake=False).collect()[0]
    assert (out["new_w"], out["new_h"]) == (32, 16)
    m = mm.decode_ppm(bytes(out["payload"]))
    assert (m["width"], m["height"]) == (32, 16)
    # numpy oracle: identical nearest-neighbor gather
    yi = np.arange(16) * 64 // 16
    xi = np.arange(32) * 128 // 32
    assert np.array_equal(m["pixels"], px[yi][:, xi])


def test_phash_invariances():
    """pHash contract: identical image → identical hash; brightness
    shift → Hamming 0 (DC-only); re-encoded downscale → small distance;
    structurally different image → large distance."""
    import numpy as np

    from hudi_demo_spark.operators.multimodal import (
        _resize_pixels, encode_ppm, phash64,
    )

    def blocky(seed, bright=0):
        rng = np.random.default_rng(seed)
        tile = rng.integers(30, 226, size=(8, 8)).astype(np.float64)
        v = np.clip(np.kron(tile, np.ones((8, 8))) + bright, 0, 255)
        return encode_ppm(np.stack([v, v, v], axis=2).astype(np.uint8))

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    base = phash64(blocky(7))
    assert phash64(blocky(7)) == base
    assert ham(base, phash64(blocky(7, bright=9))) == 0
    small = phash64(_resize_pixels(blocky(7), 32, 32))
    assert ham(base, small) <= 8  # scale-robust
    assert ham(base, phash64(blocky(8))) > 16  # different content


def test_phash_media_skips_undecodable(spark):
    from hudi_demo_spark.operators.multimodal import (
        encode_ppm, encode_wav, phash_media,
    )
    import numpy as np

    img = encode_ppm(np.full((16, 16, 3), 100, dtype=np.uint8))
    wav = encode_wav(np.zeros(10, dtype=np.int16), 8000)
    df = spark.createDataFrame(
        [(1, img), (2, wav), (3, None), (4, b"garbage")],
        "media_id long, payload binary",
    )
    rows = phash_media(df).collect()
    assert [r["media_id"] for r in rows] == [1]


def test_afp_invariances():
    """Audio fingerprint contract: identical audio → identical hash;
    volume change → Hamming ~0 (delta bits are gain-invariant); a flat
    white-noise spectrum must NOT collide with a shaped one (regression:
    band SUMS encoded band width and collided everything); different
    spectral shapes are far apart."""
    import numpy as np

    from hudi_demo_spark.operators.multimodal import afp64, encode_wav

    def shaped(seed, vol=6000, n=4000, sr=8000):
        rng = np.random.default_rng(seed)
        freqs = rng.uniform(60, 3900, size=200)
        amps = rng.uniform(0.1, 1.0, size=200)
        t = np.arange(n) / sr
        x = (amps[:, None] * np.sin(2 * np.pi * freqs[:, None] * t)).sum(0)
        return encode_wav((vol * x / np.abs(x).max()).astype(np.int16), sr)

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    base = afp64(shaped(1))
    assert afp64(shaped(1)) == base
    assert ham(base, afp64(shaped(1, vol=3500))) <= 1
    assert ham(base, afp64(shaped(2))) > 12
    rng = np.random.default_rng(9)
    white = encode_wav(
        (6000 * rng.standard_normal(4000) / 4).astype(np.int16), 8000
    )
    assert ham(base, afp64(white)) > 8


def test_afp_media_skips_non_audio(spark):
    import numpy as np

    from hudi_demo_spark.operators.multimodal import (
        afp_media, encode_ppm, encode_wav,
    )

    wav = encode_wav(
        (6000 * np.sin(np.arange(4000) / 3)).astype(np.int16), 8000
    )
    img = encode_ppm(np.full((8, 8, 3), 10, dtype=np.uint8))
    df = spark.createDataFrame(
        [(1, wav), (2, img), (3, None)], "media_id long, payload binary"
    )
    assert [r["media_id"] for r in afp_media(df).collect()] == [1]


# ---------------------------------------------------------------------------
# baseline JPEG (round-4): pure-numpy JFIF codec
# ---------------------------------------------------------------------------

def test_jpeg_gray_matches_reference_reconstruction():
    """Differential: the decoder must reproduce the independent
    reference reconstruction (FDCT → quantize → dequant → IDCT with the
    encoder's own tables) BIT-EXACTLY for grayscale — proving Huffman
    coding, zigzag, dequantization and the IDCT are all faithful."""
    from hudi_demo_spark.operators import jpeg as J

    g = _rng(7).integers(0, 256, size=(24, 40), dtype=np.uint8)
    out = J.decode_jpeg(J.encode_jpeg_baseline(g, quality=90))
    assert (out["width"], out["height"]) == (40, 24)
    A = J._idct_basis()
    ql = np.array(J._quality_scale(J._K1_LUMA, 90), dtype=float).reshape(8, 8)
    p = g.astype(float) - 128.0
    ref = np.zeros((24, 40))
    for by in range(3):
        for bx in range(5):
            blk = p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
            qz = np.round((A @ blk @ A.T) / ql)
            ref[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                A.T @ (qz * ql) @ A + 128.0
            )
    ref = np.clip(np.round(ref), 0, 255)
    assert np.array_equal(out["pixels"][:, :, 0].astype(float), ref)


def test_jpeg_block_constant_roundtrip_exact_at_q100():
    """At quality=100 every quant step is 1, so an image constant per
    8×8 block has integer DC and zero AC — the decode is EXACT. This is
    the algebraic identity the multimodal_jpeg_decode gate oracles."""
    from hudi_demo_spark.operators import jpeg as J

    tiles = _rng(5).integers(0, 256, size=(3, 4), dtype=np.uint8)
    g = np.kron(tiles, np.ones((8, 8), dtype=np.uint8))
    out = J.decode_jpeg(J.encode_jpeg_baseline(g, quality=100))
    assert np.array_equal(out["pixels"][:, :, 0], g)


def test_jpeg_color_roundtrip_close_and_odd_dims():
    from hudi_demo_spark.operators import jpeg as J

    xx, yy = np.meshgrid(np.arange(23), np.arange(17))
    c = np.stack([(xx * 5) % 256, (yy * 7) % 256, (xx + yy) % 256],
                 axis=2).astype(np.uint8)
    out = J.decode_jpeg(J.encode_jpeg_baseline(c, quality=95))
    assert (out["width"], out["height"]) == (23, 17)
    err = np.abs(out["pixels"].astype(float) - c.astype(float))
    assert err.mean() < 3.0  # lossy, but close on smooth content


def test_jpeg_restart_markers_decode_identically():
    from hudi_demo_spark.operators import jpeg as J

    g = _rng(11).integers(0, 256, size=(40, 33), dtype=np.uint8)
    a = J.decode_jpeg(J.encode_jpeg_baseline(g, quality=90))["pixels"]
    b = J.decode_jpeg(
        J.encode_jpeg_baseline(g, quality=90, restart_interval=3)
    )["pixels"]
    assert np.array_equal(a, b)
    c = _rng(12).integers(0, 256, size=(19, 21, 3), dtype=np.uint8)
    x = J.decode_jpeg(J.encode_jpeg_baseline(c, quality=90))["pixels"]
    y = J.decode_jpeg(
        J.encode_jpeg_baseline(c, quality=90, restart_interval=2)
    )["pixels"]
    assert np.array_equal(x, y)


def test_jpeg_dispatch_and_invalid_frames_rejected():
    from hudi_demo_spark.operators import jpeg as J

    g = np.full((8, 8), 99, dtype=np.uint8)
    payload = J.encode_jpeg_baseline(g, quality=100)
    assert mm.sniff(payload) == "jpeg"
    m = mm.decode_media(payload)
    assert m["kind"] == "image" and m["pixels"][0, 0, 0] == 99
    # flip SOF0 → SOF2: the baseline-shaped scan header (Ss=0, Se=63)
    # is not a legal progressive scan — loud ValueError, not garbage
    prog = bytearray(payload)
    i = prog.find(b"\xff\xc0")
    prog[i + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive DC scan"):
        J.decode_jpeg(bytes(prog))
    # lossless-arithmetic (SOF11) stays an honest NotImplementedError
    # (SOF9/SOF10 arithmetic are decoded for real since round 8)
    arith = bytearray(payload)
    arith[i + 1] = 0xCB
    with pytest.raises(NotImplementedError, match="arithmetic"):
        J.decode_jpeg(bytes(arith))
    # SOF5/SOF7 hierarchical frames decode since round 10 — but only
    # inside an Annex J stream: a bare differential frame with no DHP
    # is a stream error, named loudly
    hier = bytearray(payload)
    hier[i + 1] = 0xC5
    with pytest.raises(ValueError, match="without a preceding DHP"):
        J.decode_jpeg(bytes(hier))
    # the never-shipped hierarchical SUB-modes stay honest gaps with
    # the exact frame type NAMED, so a 100 TB decode job reports the
    # unsupported marker instead of dropping payloads
    hier[i + 1] = 0xC6
    with pytest.raises(NotImplementedError, match="SOF6.*hierarchical"):
        J.decode_jpeg(bytes(hier))


def test_jpeg_progressive_matches_baseline_bit_exact():
    """Progressive (SOF2) decode: the fixture encoder emits the SAME
    quantized coefficients as the baseline encoder under a multi-scan
    script (spectral selection + successive approximation), so decoding
    either stream must produce IDENTICAL pixels — pinning DC first/
    refine, AC first/refine, EOB-run and ZRL-in-refinement paths."""
    from hudi_demo_spark.operators import jpeg as J

    g = _rng(21).integers(0, 256, size=(24, 40), dtype=np.uint8)
    base = J.decode_jpeg(J.encode_jpeg_baseline(g, quality=90))["pixels"]
    prog = J.decode_jpeg(J.encode_jpeg_progressive(g, quality=90))["pixels"]
    assert np.array_equal(base, prog)
    c = _rng(22).integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    bc = J.decode_jpeg(J.encode_jpeg_baseline(c, quality=85))["pixels"]
    pc = J.decode_jpeg(J.encode_jpeg_progressive(c, quality=85))["pixels"]
    assert np.array_equal(bc, pc)
    # smooth content exercises multi-block EOB runs; spikes exercise
    # ZRL inside refinement scans
    xx, yy = np.meshgrid(np.arange(96), np.arange(64))
    smooth = ((xx + yy) // 4).astype(np.uint8)
    assert np.array_equal(
        J.decode_jpeg(J.encode_jpeg_baseline(smooth, quality=85))["pixels"],
        J.decode_jpeg(J.encode_jpeg_progressive(smooth, quality=85))["pixels"],
    )
    spike = np.full((48, 48), 128, np.uint8)
    spike[::7, ::5] = 255
    spike[3::11, 2::9] = 0
    assert np.array_equal(
        J.decode_jpeg(J.encode_jpeg_baseline(spike, quality=92))["pixels"],
        J.decode_jpeg(J.encode_jpeg_progressive(spike, quality=92))["pixels"],
    )


def test_jpeg_progressive_restarts_and_custom_scripts():
    """Progressive decode under restart markers and a deep
    successive-approximation scan script (Al down from 3, narrow
    bands, interleaved DC refinements) stays bit-exact vs baseline."""
    from hudi_demo_spark.operators import jpeg as J

    g = _rng(23).integers(0, 256, size=(40, 56), dtype=np.uint8)
    scans = [
        ([0], 0, 0, 0, 3), ([0], 1, 2, 0, 3), ([0], 3, 63, 0, 3),
        ([0], 1, 63, 3, 2), ([0], 1, 63, 2, 1),
        ([0], 0, 0, 3, 2), ([0], 0, 0, 2, 1), ([0], 0, 0, 1, 0),
        ([0], 1, 63, 1, 0),
    ]
    base = J.decode_jpeg(J.encode_jpeg_baseline(g, quality=70))["pixels"]
    prog = J.decode_jpeg(
        J.encode_jpeg_progressive(g, quality=70, scans=scans)
    )["pixels"]
    assert np.array_equal(base, prog)
    c = _rng(24).integers(0, 256, size=(41, 29, 3), dtype=np.uint8)
    bc = J.decode_jpeg(J.encode_jpeg_baseline(c, quality=60))["pixels"]
    pc = J.decode_jpeg(
        J.encode_jpeg_progressive(c, quality=60, restart_interval=3)
    )["pixels"]
    assert np.array_equal(bc, pc)
    # progressive payloads flow through the decode_media dispatch too
    m = mm.decode_media(J.encode_jpeg_progressive(c, quality=60))
    assert m["kind"] == "image" and (m["width"], m["height"]) == (29, 41)


def test_jpeg_feature_extraction_mapinpandas(spark):
    """End-to-end: JPEG payloads flow through the same Arrow-batched
    extract_features path as PPM/BMP/WAV."""
    from hudi_demo_spark.operators import jpeg as J

    tiles = _rng(9).integers(0, 256, size=(4, 4), dtype=np.uint8)
    g = np.kron(tiles, np.ones((8, 8), dtype=np.uint8))
    payload = J.encode_jpeg_baseline(g, quality=100)
    media = spark.createDataFrame(
        [(1, payload)], "media_id long, payload binary"
    )
    row = mm.extract_features(media, fake=False).collect()[0]
    assert row["n_bytes"] == len(payload)
    feats = row["feature"]
    assert feats[0] == 32.0 and feats[1] == 32.0  # width, height
    assert abs(feats[2] - float(g.mean())) < 1e-6  # exact decode → mean


# ---------------------------------------------------------------------------
# PNG (round-4): numpy + stdlib-zlib decoder
# ---------------------------------------------------------------------------

def _png_chunks(ihdr_body, extra, pixdata):
    """Hand-build a PNG from raw parts (paths the fixture encoder
    doesn't emit: palette, RGBA, 16-bit)."""
    import struct
    import zlib

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr_body)
    for ctype, body in extra:
        out += chunk(ctype, body)
    out += chunk(b"IDAT", zlib.compress(pixdata)) + chunk(b"IEND", b"")
    return out


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("gray", [False, True])
def test_png_roundtrip_every_filter(ft, gray):
    from hudi_demo_spark.operators.png import decode_png, encode_png

    if gray:
        a = _rng(ft).integers(0, 256, size=(9, 21), dtype=np.uint8)
    else:
        a = _rng(ft).integers(0, 256, size=(13, 17, 3), dtype=np.uint8)
    out = decode_png(encode_png(a, filter_type=ft))
    want = np.stack([a, a, a], axis=2) if gray else a
    assert np.array_equal(out["pixels"], want)


def test_png_rgba_composites_over_black():
    import struct

    from hudi_demo_spark.operators.png import decode_png

    # 1×2 RGBA: opaque red, half-transparent white
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 6, 0, 0, 0)
    row = b"\x00" + bytes([255, 0, 0, 255, 255, 255, 255, 128])
    out = decode_png(_png_chunks(ihdr, [], row))
    assert out["pixels"][0, 0].tolist() == [255, 0, 0]
    assert out["pixels"][0, 1].tolist() == [128, 128, 128]


def test_png_palette_and_16bit():
    import struct

    from hudi_demo_spark.operators.png import decode_png

    # 2×2 paletted (depth 8): indices into a 3-color palette
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    rows = b"\x00" + bytes([0, 1]) + b"\x00" + bytes([2, 0])
    out = decode_png(_png_chunks(ihdr, [(b"PLTE", plte)], rows))
    assert out["pixels"][0, 0].tolist() == [255, 0, 0]
    assert out["pixels"][0, 1].tolist() == [0, 255, 0]
    assert out["pixels"][1, 0].tolist() == [0, 0, 255]
    # 1×2 16-bit gray: high byte survives the scale-down
    ihdr16 = struct.pack(">IIBBBBB", 2, 1, 16, 0, 0, 0, 0)
    row16 = b"\x00" + struct.pack(">HH", 0xABCD, 0x1234)
    o16 = decode_png(_png_chunks(ihdr16, [], row16))
    assert o16["pixels"][0, 0, 0] == 0xAB and o16["pixels"][0, 1, 0] == 0x12


def test_png_sub_byte_palette_depth():
    import struct

    from hudi_demo_spark.operators.png import decode_png

    # 4×1 depth-2 palette: indices 0,1,2,3 packed into one byte
    ihdr = struct.pack(">IIBBBBB", 4, 1, 2, 3, 0, 0, 0)
    plte = bytes([10, 0, 0, 0, 20, 0, 0, 0, 30, 40, 40, 40])
    row = b"\x00" + bytes([0b00011011])
    out = decode_png(_png_chunks(ihdr, [(b"PLTE", plte)], row))
    assert [out["pixels"][0, i].tolist() for i in range(4)] == [
        [10, 0, 0], [0, 20, 0], [0, 0, 30], [40, 40, 40]]


def test_png_interlaced_rejected_and_dispatch():
    import struct

    from hudi_demo_spark.operators.png import decode_png, encode_png

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)  # interlace=1
    with pytest.raises(NotImplementedError, match="Adam7"):
        decode_png(_png_chunks(ihdr, [], b""))
    a = np.full((4, 4, 3), 7, dtype=np.uint8)
    payload = encode_png(a)
    assert mm.sniff(payload) == "png"
    assert np.array_equal(mm.decode_media(payload)["pixels"], a)


def _lzw_compress_ref(indices, bits):
    """Reference GIF-LZW COMPRESSOR (dictionary-building, unlike
    encode_gif's literal-code stream) — exercises the decoder's
    dict-growth and KwKwK paths against real compressed output."""
    clear, end = 1 << bits, (1 << bits) + 1
    width = bits + 1
    table = {(i,): i for i in range(clear)}
    next_code = end + 1
    acc = nbits = 0
    out = bytearray()

    def emit(code, w):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, width)
    run = (int(indices[0]),)
    for v in indices[1:]:
        v = int(v)
        if run + (v,) in table:
            run = run + (v,)
            continue
        emit(table[run], width)
        table[run + (v,)] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        run = (v,)
    emit(table[run], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_gif_roundtrip_and_real_lzw():
    import struct

    from hudi_demo_spark.operators.gif import (
        _lzw_decode, decode_gif, encode_gif,
    )

    rng = np.random.default_rng(11)
    for ncol, interlace in [(4, False), (16, True), (256, False)]:
        pal = [tuple(int(x) for x in rng.integers(0, 256, 3))
               for _ in range(ncol)]
        idx = rng.integers(0, ncol, size=(13, 9)).astype(np.uint8)
        m = decode_gif(encode_gif(idx, pal, interlace=interlace))
        assert np.array_equal(
            m["pixels"], np.array(pal, np.uint8)[idx]
        ), (ncol, interlace)

    # decoder vs a REAL dictionary-building compressor (repetitive data
    # forces multi-symbol entries and the KwKwK code == len(table) case)
    seq = ([0, 0, 0, 1, 1, 0, 0, 1] * 40 + [2, 3] * 17 + [0] * 64)
    blob = _lzw_compress_ref(seq, 2)
    assert _lzw_decode(blob, 2) == seq

    # transparency composites over black; dispatch sniffs gif
    pal = [(255, 0, 0), (0, 255, 0)]
    idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    payload = encode_gif(idx, pal, transparent=1)
    assert mm.sniff(payload) == "gif"
    px = mm.decode_media(payload)["pixels"]
    assert px[0, 1].tolist() == [0, 0, 0]
    assert px[0, 0].tolist() == [255, 0, 0]

    # malformed streams refuse loudly
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + struct.pack("<HHBBB", 1, 1, 0, 0, 0) + b"\x3b")

    # an out-of-range FIRST code after a clear is a contract ValueError,
    # not an IndexError: min_code_size=2 → clear=4, end=5, so code 7 is
    # out of range as the first emitted code (3-bit codes: 7 = 0b111)
    with pytest.raises(ValueError, match="corrupt LZW"):
        _lzw_decode(bytes([0b111]), 2)


def test_y4m_mono_roundtrip_exact():
    """Cmono stores luma losslessly: decoded frames are the encoded
    grays replicated to RGB; header metadata round-trips."""
    frames = _rng(11).integers(0, 256, size=(5, 12, 16)).astype(np.uint8)
    payload = mm.encode_y4m(frames, fps=10, colorspace="mono")
    assert mm.sniff(payload) == "y4m"
    m = mm.decode_media(payload)
    assert (m["kind"], m["width"], m["height"]) == ("video", 16, 12)
    assert (m["n_frames"], m["fps"], m["duration_ms"]) == (5, 10.0, 500)
    assert np.array_equal(m["frames"], np.repeat(frames[..., None], 3, 3))


def test_y4m_color_roundtrip_and_errors():
    rgb = _rng(12).integers(20, 236, size=(3, 8, 8, 3)).astype(np.uint8)
    # C444: lossy only through YUV rounding — within 2 levels
    m = mm.decode_y4m(mm.encode_y4m(rgb, colorspace="444"))
    assert m["frames"].shape == (3, 8, 8, 3)
    assert np.abs(m["frames"].astype(int) - rgb.astype(int)).max() <= 2
    # C420: flat-chroma (gray) content survives subsampling within
    # rounding even though chroma is stored quarter-res
    g = _rng(13).integers(20, 236, size=(2, 8, 8)).astype(np.uint8)
    gray = np.repeat(g[..., None], 3, 3)
    m4 = mm.decode_y4m(mm.encode_y4m(gray, colorspace="420"))
    assert np.abs(m4["frames"].astype(int) - gray.astype(int)).max() <= 2

    mono = g  # (2, 8, 8)
    with pytest.raises(ValueError):
        mm.encode_y4m(rgb, colorspace="422")
    with pytest.raises(ValueError):
        mm.encode_y4m(rgb[:, :7], colorspace="420")  # odd height
    with pytest.raises(NotImplementedError):
        mm.decode_y4m(b"YUV4MPEG2 W2 H2 F25:1 C422\n")
    with pytest.raises(ValueError):  # truncated frame body
        full = mm.encode_y4m(mono, colorspace="mono")
        mm.decode_y4m(full[:-3])
    with pytest.raises(ValueError):  # header only, no frames
        mm.decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 Cmono\n")


def test_video_phash_brightness_invariant_and_sampling(spark):
    """Per-frame pHash ignores a uniform brightness offset (DC-only);
    every_n/max_frames select the expected frame indices; near-dup
    mining pairs exactly the same-content videos."""
    rng = _rng(21)
    base = rng.integers(40, 200, size=(6, 32, 32)).astype(np.uint8)
    vids = [
        (1, mm.encode_y4m(base, colorspace="mono")),
        (2, mm.encode_y4m(np.clip(base.astype(int) + 9, 0, 255)
                          .astype(np.uint8), colorspace="mono")),
        (3, mm.encode_y4m(
            rng.integers(40, 200, size=(6, 32, 32)).astype(np.uint8),
            colorspace="mono")),
        (4, b"not a video"),
    ]
    media = spark.createDataFrame(vids, "media_id long, payload binary")

    sigs = mm.video_phashes(media, every_n=2, max_frames=2).collect()
    by_vid = {}
    for r in sigs:
        by_vid.setdefault(r.media_id, {})[r.frame_idx] = r.phash
    assert set(by_vid) == {1, 2, 3}
    assert set(by_vid[1]) == {0, 2}  # every_n=2 capped at 2 frames
    assert by_vid[1] == by_vid[2]    # brightness cancels per frame
    assert by_vid[1] != by_vid[3]

    pairs = mm.video_near_dups(
        media, max_hamming=3, min_frame_frac=1.0
    ).collect()
    assert [(r.a, r.b, r.n_matched, r.n_compared) for r in pairs] == [
        (1, 2, 6, 6)
    ]

    frames = mm.video_frames(media, every_n=3).collect()
    assert {(r.media_id, r.frame_idx) for r in frames} == {
        (v, i) for v in (1, 2, 3) for i in (0, 3)
    }
    one = next(r for r in frames if r.media_id == 1 and r.frame_idx == 3)
    px = mm.decode_media(bytes(one.payload))
    assert px["kind"] == "image" and (px["width"], px["height"]) == (32, 32)
    assert np.array_equal(
        px["pixels"], np.repeat(base[3][..., None], 3, 2)
    )


def test_jpeg_420_baseline_matches_independent_reconstruction():
    """4:2:0 baseline: the fixture encoder interleaves 4Y+Cb+Cr MCUs and
    the decoder must reproduce an INDEPENDENT numpy reconstruction
    (downsample → FDCT → quantize → dequant → IDCT → repeat-upsample →
    color matrix) BIT-EXACTLY — pinning the subsampled MCU geometry and
    chroma upsampling with a real stream, which 4:4:4 tests never
    touch."""
    from hudi_demo_spark.operators import jpeg as J

    def reference_420(img, q):
        A = J._idct_basis()
        ql = np.array(J._quality_scale(J._K1_LUMA, q), float).reshape(8, 8)
        qc = np.array(J._quality_scale(J._K2_CHROMA, q), float).reshape(8, 8)
        a = img.astype(float)
        h, w = a.shape[:2]
        r, g, b = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        y = .299 * r + .587 * g + .114 * b
        cb = -.168736 * r - .331264 * g + .5 * b + 128.
        cr = .5 * r - .418688 * g - .081312 * b + 128.

        def pad(p, th, tw):
            ph, pw = p.shape
            if ph < th:
                p = np.concatenate(
                    [p, np.repeat(p[-1:, :], th - ph, 0)], 0)
            if pw < tw:
                p = np.concatenate(
                    [p, np.repeat(p[:, -1:], tw - pw, 1)], 1)
            return p

        def down(p):
            pp = pad(p, -(-h // 2) * 2, -(-w // 2) * 2)
            return (pp[0::2, 0::2] + pp[0::2, 1::2]
                    + pp[1::2, 0::2] + pp[1::2, 1::2]) / 4.

        mcux, mcuy = -(-w // 16), -(-h // 16)

        def codec(p, qt, bh, bw):
            p = pad(p, bh * 8, bw * 8) - 128.
            out = np.zeros_like(p)
            for by in range(bh):
                for bx in range(bw):
                    blk = p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                    qz = np.round((A @ blk @ A.T) / qt)
                    out[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                        A.T @ (qz * qt) @ A + 128.)
            return out

        yy = codec(y, ql, mcuy * 2, mcux * 2)[:h, :w]
        cbb = np.repeat(np.repeat(
            codec(down(cb), qc, mcuy, mcux), 2, 0), 2, 1)[:h, :w] - 128.
        crr = np.repeat(np.repeat(
            codec(down(cr), qc, mcuy, mcux), 2, 0), 2, 1)[:h, :w] - 128.
        rgb = np.stack([yy + 1.402 * crr,
                        yy - 0.344136 * cbb - 0.714136 * crr,
                        yy + 1.772 * cbb], 2)
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)

    rng = _rng(31)
    for shape, q, ri in [((32, 32, 3), 90, 0), ((17, 23, 3), 85, 0),
                         ((20, 36, 3), 75, 2)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        dec = J.decode_jpeg(
            J.encode_jpeg_420(img, quality=q, restart_interval=ri)
        )
        assert np.array_equal(dec["pixels"], reference_420(img, q)), (
            shape, q, ri)


def test_jpeg_420_progressive_matches_baseline():
    """Progressive 4:2:0 == baseline 4:2:0 bit-exact: interleaved DC
    scans walk the 4Y+Cb+Cr MCU geometry while AC scans walk each
    component's OWN grid — at (20, 36) the luma AC grid (5 block
    columns) is SMALLER than the MCU-padded DC grid (6), the exact
    T.81 A.2.2 geometry distinction real progressive files depend on."""
    from hudi_demo_spark.operators import jpeg as J

    rng = _rng(32)
    for shape, q, ri in [((17, 23, 3), 85, 0), ((20, 36, 3), 75, 0),
                         ((20, 36, 3), 75, 2), ((41, 29, 3), 60, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        base = J.decode_jpeg(J.encode_jpeg_420(img, quality=q))["pixels"]
        prog = J.decode_jpeg(
            J.encode_jpeg_progressive(
                img, quality=q, restart_interval=ri, subsampling="420"
            )
        )["pixels"]
        assert np.array_equal(base, prog), (shape, q, ri)


def test_ppm_16bit_roundtrip():
    """16-bit PPM (maxval > 255): the spec's 2-byte big-endian samples —
    previously an honest NotImplementedError; now decoded to uint16
    with maxval recorded so callers can normalize."""
    import numpy as np

    from hudi_demo_spark.operators import multimodal as mm

    rng = np.random.default_rng(7)
    px = rng.integers(0, 65535, size=(5, 4, 3), dtype=np.uint16)
    m = mm.decode_ppm(mm.encode_ppm(px, maxval=65535))
    assert (m["width"], m["height"], m["maxval"]) == (4, 5, 65535)
    assert m["pixels"].dtype == np.uint16
    assert np.array_equal(m["pixels"], px)
    # hand-built header with a comment, odd maxval, big-endian body
    manual = b"P2P"[:2] + b"\n# c\n3 2\n1023\n" + px[:2, :3].astype(">u2").tobytes()
    got = mm.decode_ppm(b"P6" + manual[2:])
    assert got["maxval"] == 1023 and got["pixels"].shape == (2, 3, 3)
    assert np.array_equal(got["pixels"], px[:2, :3])


def test_jpeg_lossless_roundtrip_all_predictors():
    """SOF3 lossless (Annex H): the fixture encoder's roundtrip must be
    EXACT for every predictor — the lossless self-oracle (no float
    tolerance, no reference decoder needed)."""
    import numpy as np

    from hudi_demo_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg_lossless,
    )

    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, size=(23, 17), dtype=np.int64)
    for p in range(1, 8):
        d = decode_jpeg(encode_jpeg_lossless(img, predictor=p))
        assert d["lossless"] and d["precision"] == 8
        assert np.array_equal(d["pixels"][:, :, 0], img.astype(np.uint8)), p
        # grayscale replicates to 3 channels, same as the DCT paths
        assert d["pixels"].shape == (23, 17, 3)


def test_jpeg_lossless_deep_precision_restarts_and_pt():
    """16-bit samples with restart intervals (prediction resets to the
    scan-start default each interval), 12-bit autodetect, and the point
    transform's >>Pt <<Pt truncation — all exact."""
    import numpy as np

    from hudi_demo_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg_lossless,
    )

    rng = np.random.default_rng(7)
    img3 = rng.integers(0, 65536, size=(11, 13, 3), dtype=np.int64)
    d = decode_jpeg(
        encode_jpeg_lossless(img3, predictor=4, restart_interval=20)
    )
    assert d["precision"] == 16
    assert np.array_equal(d["pixels"], img3.astype(np.uint16))
    d = decode_jpeg(encode_jpeg_lossless(img3, predictor=7, pt=3))
    assert np.array_equal(d["pixels"], ((img3 >> 3) << 3).astype(np.uint16))
    img12 = rng.integers(0, 4096, size=(9, 9), dtype=np.int64)
    d = decode_jpeg(encode_jpeg_lossless(img12, predictor=5))
    assert d["precision"] == 12
    assert np.array_equal(d["pixels"][:, :, 0], img12.astype(np.uint16))


def test_jpeg_lossless_rejects_out_of_scope():
    """Honest-gap boundaries: subsampled lossless frames and arithmetic
    frames still raise loudly."""
    import numpy as np
    import pytest as _pytest

    from hudi_demo_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg_lossless,
    )

    img = np.zeros((4, 4), dtype=np.int64)
    payload = bytearray(encode_jpeg_lossless(img))
    sof = payload.index(b"\xff\xc3")
    payload[sof + 11] = 0x22  # hv of the only component -> 2x2
    with _pytest.raises(NotImplementedError, match="subsampling"):
        decode_jpeg(bytes(payload))
    payload = bytearray(encode_jpeg_lossless(img))
    payload[payload.index(b"\xff\xc3") + 1] = 0xCB  # SOF11 arithmetic
    with _pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(bytes(payload))


def test_jpeg_lossless_restart_resets_row_context_per_spec():
    """Restart markers reset prediction AS AT SCAN START (T.81 H.1.1:
    initial conditions apply 'at the start of the scan and at the
    beginning of each restart interval'; libjpeg's lossless
    undifferencer behaves identically): the post-restart row is a FIRST
    LINE — its first sample takes the default 2^(P-1), the rest predict
    1-D from Ra, and NO sample references reconstructed rows from
    before the marker. The encoder mirrors the decoder, so a roundtrip
    alone cannot pin this; this test HAND-BUILDS the entropy stream
    from spec-derived differences and asserts both directions."""
    import numpy as np

    from hudi_demo_spark.operators.jpeg import (
        _BitWriter, _LOSSLESS_BITS, _LOSSLESS_VALS, _csize, _enc_codes,
        decode_jpeg, encode_jpeg_lossless,
    )

    img = np.array([[100, 101], [50, 60]], dtype=np.int64)
    # predictor 2 (Rb), precision 8, DRI=2 (row-aligned). Spec decode:
    #  (0,0) default 128   -> diff -28
    #  (0,1) first line Ra -> diff   1
    #  -- RST0 --
    #  (1,0) default 128   -> diff -78   (NOT Rb=100)
    #  (1,1) first line Ra -> diff  10   (NOT Rb=101: row 1 restarts
    #                                     as a first line)
    enc = _enc_codes(_LOSSLESS_BITS, _LOSSLESS_VALS)

    def entropy(diffs):
        w = _BitWriter()
        for d in diffs:
            t = _csize(d)
            code, length = enc[t]
            w.write(code, length)
            if t:
                w.write(d if d >= 0 else d + (1 << t) - 1, t)
        w.flush()
        return bytes(w.out)

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    stream = (
        b"\xff\xd8"
        + seg(0xC4, bytes([0x00]) + bytes(_LOSSLESS_BITS[1:17])
              + bytes(_LOSSLESS_VALS))
        + seg(0xC3, struct.pack(">BHHB", 8, 2, 2, 1) + bytes([1, 0x11, 0]))
        + seg(0xDD, struct.pack(">H", 2))
        + seg(0xDA, bytes([1, 1, 0x00, 2, 0, 0]))
        + entropy([-28, 1]) + b"\xff\xd0" + entropy([-78, 10])
        + b"\xff\xd9"
    )
    d = decode_jpeg(stream)
    assert np.array_equal(d["pixels"][:, :, 0], img.astype(np.uint8))
    # and the fixture encoder emits this exact byte stream
    assert encode_jpeg_lossless(img, predictor=2, restart_interval=2) == stream


def test_jpeg_arithmetic_matches_baseline_decode():
    """SOF9 (sequential DCT, arithmetic entropy, T.81 Annex D QM-coder):
    encode_jpeg_arith carries the SAME quantized coefficients as the
    Huffman encoders, so decode_jpeg of both streams must be
    BIT-IDENTICAL — a cross-entropy-coder differential a shared QM bug
    cannot satisfy. Sweeps gray/444/420, restart intervals, and a
    non-default Kx conditioning (via DAC)."""
    import numpy as np

    from hudi_demo_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg_420, encode_jpeg_baseline,
    )
    from hudi_demo_spark.operators.jpeg_arith import encode_jpeg_arith

    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, size=(17, 23), dtype=np.uint8)
    rgb = rng.integers(0, 256, size=(21, 19, 3), dtype=np.uint8)
    cases = [
        (gray, encode_jpeg_baseline(gray, quality=85), dict()),
        (rgb, encode_jpeg_baseline(rgb, quality=85), dict()),
        (rgb, encode_jpeg_baseline(rgb, quality=100),
         dict(quality=100, restart_interval=3)),
        (rgb, encode_jpeg_420(rgb, quality=70),
         dict(quality=70, subsampling="420", kx=1)),
    ]
    for img, huff, kw in cases:
        kw.setdefault("quality", 85)
        ar = encode_jpeg_arith(img, **kw)
        assert b"\xff\xc9" in ar and b"\xff\xcc" in ar  # SOF9 + DAC
        assert np.array_equal(
            decode_jpeg(ar)["pixels"], decode_jpeg(huff)["pixels"]
        ), kw
        # arithmetic should genuinely compress better than Huffman on
        # noise — a self-consistent-but-degenerate coder would not
        assert len(ar) < len(huff), kw


def test_qm_coder_roundtrip_stress_and_table_structure():
    """Raw QM-coder pair: randomized decision/context streams (uniform,
    heavily-MPS, heavily-LPS — driving carries, 0xFF stuffing runs, and
    every estimation chain) must roundtrip exactly; Table D.3 must be
    structurally sound; stuffed streams must never end on a bare
    0xFF."""
    import numpy as np

    from hudi_demo_spark.operators.jpeg_arith import (
        _QM, FIXED_BIN, ArithDecoder, ArithEncoder,
    )

    assert len(_QM) == 114
    for i, (qe, nm, nl, sw) in enumerate(_QM):
        assert 0 < qe < 0x8000 and 0 <= nm <= 113 and 0 <= nl <= 113
        assert sw in (0, 1), i
    assert _QM[FIXED_BIN] == (0x5A1D, 113, 113, 0)
    # SWITCH only ever set on states whose NLPS stays in the fast-attack
    # startup region (MPS sense can only flip where Qe ~ 0.5)
    for i, (qe, nm, nl, sw) in enumerate(_QM[:113]):
        if sw:
            assert qe > 0x5000, i

    rng = np.random.default_rng(3)
    for trial in range(200):
        n = int(rng.integers(1, 2500))
        ncx = int(rng.integers(1, 16))
        p = (0.98, 0.5, 0.02)[trial % 3]
        bits = (rng.random(n) < p).astype(int).tolist()
        cxs = rng.integers(0, ncx, size=n).tolist()
        enc = ArithEncoder()
        st_e = bytearray(ncx)
        for b, cx in zip(bits, cxs):
            enc.encode(st_e, cx, int(b))
        stuffed = enc.flush()
        assert not stuffed or stuffed[-1] != 0xFF
        assert all(
            stuffed[i + 1] == 0
            for i in range(len(stuffed) - 1) if stuffed[i] == 0xFF
        )
        dec = ArithDecoder(stuffed.replace(b"\xff\x00", b"\xff"))
        st_d = bytearray(ncx)
        got = [dec.decode(st_d, cx) for cx in cxs]
        assert got == bits, trial


def test_jpeg_arith_progressive_matches_baseline_decode():
    """SOF10 (progressive DCT, arithmetic): the Annex G.2 models over
    the QM coder — DC first/refine, AC first/refine with EOBx — carry
    the SAME quantized coefficients as the Huffman encoders, so decode
    must be bit-identical to the baseline stream. Sweeps the default
    multi-scan script (incl. successive-approximation refinement) at
    gray/444/420 with and without restarts."""
    import numpy as np

    from hudi_demo_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg_420, encode_jpeg_baseline,
    )
    from hudi_demo_spark.operators.jpeg_arith import (
        encode_jpeg_arith_progressive,
    )

    rng = np.random.default_rng(13)
    gray = rng.integers(0, 256, size=(17, 23), dtype=np.uint8)
    rgb = rng.integers(0, 256, size=(33, 40, 3), dtype=np.uint8)
    cases = [
        (gray, encode_jpeg_baseline(gray, quality=85), dict()),
        (rgb, encode_jpeg_baseline(rgb, quality=85),
         dict(restart_interval=3)),
        (rgb, encode_jpeg_420(rgb, quality=70),
         dict(quality=70, subsampling="420")),
    ]
    for img, huff, kw in cases:
        kw.setdefault("quality", 85)
        ar = encode_jpeg_arith_progressive(img, **kw)
        assert b"\xff\xca" in ar and b"\xff\xcc" in ar  # SOF10 + DAC
        assert np.array_equal(
            decode_jpeg(ar)["pixels"], decode_jpeg(huff)["pixels"]
        ), kw


def test_jpeg_arith_rejects_lossless_arith():
    """SOF11 (lossless arithmetic) remains a loud honest gap after
    SOF9/SOF10 support (its H.2 context table has no public reference
    implementation to pin against)."""
    import numpy as np
    import pytest as _pytest

    from hudi_demo_spark.operators.jpeg import decode_jpeg
    from hudi_demo_spark.operators.jpeg_arith import encode_jpeg_arith

    img = np.zeros((8, 8), dtype=np.uint8)
    payload = bytearray(encode_jpeg_arith(img))
    payload[payload.index(b"\xff\xc9") + 1] = 0xCB
    with _pytest.raises(NotImplementedError):
        decode_jpeg(bytes(payload))


def test_jpeg_12bit_extended_sequential_huffman_and_arith():
    """12-bit extended sequential (B.2.2 allows 8/12-bit for SOF1 and
    SOF9): block-constant 12-bit fields decode EXACTLY at quality=100
    (all-ones table written as a 16-bit Pq=1 DQT — that parse path is
    only reachable here), uint16 pixels with precision recorded (the
    SOF3/16-bit-PPM deep-sample contract); Huffman and arithmetic
    streams carry identical coefficients, so lossy decodes are
    bit-equal too. Baseline/progressive frames still refuse 12-bit."""
    import numpy as np
    import pytest as _pytest

    from hudi_demo_spark.operators.jpeg import decode_jpeg
    from hudi_demo_spark.operators.jpeg_arith import encode_jpeg_ext

    rng = np.random.default_rng(21)
    tiles = rng.integers(0, 4096, size=(3, 4))
    img = np.kron(tiles, np.ones((8, 8), dtype=np.int64)).astype(np.int64)
    for arith in (False, True):
        d = decode_jpeg(
            encode_jpeg_ext(img, quality=100, arith=arith,
                            restart_interval=5)
        )
        assert d["precision"] == 12
        assert d["pixels"].dtype == np.uint16
        assert np.array_equal(d["pixels"][:, :, 0], img.astype(np.uint16))
    noise = rng.integers(0, 4096, size=(23, 17), dtype=np.int64)
    for q in (50, 85, 100):
        dh = decode_jpeg(encode_jpeg_ext(noise, quality=q))["pixels"]
        da = decode_jpeg(
            encode_jpeg_ext(noise, quality=q, arith=True,
                            restart_interval=3)
        )["pixels"]
        assert np.array_equal(dh, da), q
    # flipping the 12-bit SOF1 to SOF0 (baseline) must refuse loudly
    payload = bytearray(encode_jpeg_ext(img))
    payload[payload.index(b"\xff\xc1") + 1] = 0xC0
    with _pytest.raises(NotImplementedError, match="precision"):
        decode_jpeg(bytes(payload))


def test_jpeg_hierarchical_lossless_final_is_exact():
    """Hierarchical (Annex J) self-oracle: a pyramid whose final frame
    is differential LOSSLESS must roundtrip EXACTLY — any divergence
    between encoder and decoder in the EXP filter, the mod-2^16 fold,
    the DCT clamp convention or the frame orchestration breaks this."""
    from hudi_demo_spark.operators import jpeg as J

    rng = np.random.default_rng(7)
    # levels >= 2: a 1-level "pyramid" is a plain lossy DCT frame with
    # no differential stage for lossless_final to apply to
    for shape, levels in (((37, 53), 3), ((45, 17), 4), ((8, 8), 2),
                          ((16, 16), 2)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        out = J.decode_jpeg(
            J.encode_jpeg_hierarchical(img, levels=levels, quality=60)
        )
        assert out["width"] == shape[1] and out["height"] == shape[0]
        assert np.array_equal(out["pixels"][:, :, 0], img), (shape, levels)
        assert np.array_equal(out["pixels"][:, :, 1], img)


def test_jpeg_hierarchical_color_matches_encoder_mirror():
    """3-component hierarchical pyramid: the YCbCr planes roundtrip
    exactly (lossless final frame), so the decoded RGB must equal the
    JFIF back-conversion of the encoder's own rounded YCbCr planes."""
    from hudi_demo_spark.operators import jpeg as J

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
    out = J.decode_jpeg(J.encode_jpeg_hierarchical(img, levels=2))
    r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
    y = np.clip(np.round(0.299 * r + 0.587 * g + 0.114 * b), 0, 255)
    cb = np.clip(
        np.round(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0), 0, 255
    )
    cr = np.clip(
        np.round(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0), 0, 255
    )
    rgb = np.stack(
        [y + 1.402 * (cr - 128.0),
         y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
         y + 1.772 * (cb - 128.0)],
        axis=2,
    )
    want = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    assert np.array_equal(out["pixels"], want)


def test_jpeg_hierarchical_dct_final_approximates():
    """All-DCT pyramid (lossless_final=False): decodes through the
    differential SOF5 path and lands near the source — the smooth-
    gradient case every DCT codec must handle well."""
    from hudi_demo_spark.operators import jpeg as J

    gy, gx = np.mgrid[0:32, 0:32]
    img = ((gy * 4 + gx * 3) % 200 + 20).astype(np.uint8)
    out = J.decode_jpeg(
        J.encode_jpeg_hierarchical(
            img, levels=2, quality=95, lossless_final=False
        )
    )
    err = np.abs(
        out["pixels"][:, :, 0].astype(int) - img.astype(int)
    ).max()
    assert err <= 12, f"max err {err}"
    # 1-level pyramid: a single non-differential frame, plain lossy DCT
    one = J.decode_jpeg(J.encode_jpeg_hierarchical(img, levels=1,
                                                   quality=95))
    err1 = np.abs(
        one["pixels"][:, :, 0].astype(int) - img.astype(int)
    ).max()
    assert err1 <= 12, f"1-level max err {err1}"


def test_jpeg_hierarchical_exp_filter_is_annex_j():
    """J.1.1.2 expansion: doubled samples interleave the (a+b+1)>>1
    midpoints and the final sample replicates the edge."""
    from hudi_demo_spark.operators.jpeg import _hier_exp_plane

    p = np.array([[10, 20, 31]], dtype=np.int64)
    assert _hier_exp_plane(p, 1, 0).tolist() == [[10, 15, 20, 26, 31, 31]]
    q = np.array([[4], [9]], dtype=np.int64)
    assert _hier_exp_plane(q, 0, 1).tolist() == [[4], [7], [9], [9]]
    # single-sample dimension: pure edge replication
    assert _hier_exp_plane(
        np.array([[5]], dtype=np.int64), 1, 1
    ).tolist() == [[5, 5], [5, 5]]


def test_jpeg_hierarchical_roundtrip_fuzz():
    """Randomized exact-roundtrip fuzz over dims x levels x quality:
    the lossless-final pyramid contract must hold for ANY shape, not
    just the pinned cases."""
    from hypothesis import given, settings, strategies as st

    from hudi_demo_spark.operators import jpeg as J

    @settings(max_examples=12, deadline=None)
    @given(
        h=st.integers(min_value=1, max_value=40),
        w=st.integers(min_value=1, max_value=40),
        levels=st.integers(min_value=2, max_value=4),
        quality=st.integers(min_value=10, max_value=95),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    def run(h, w, levels, quality, seed):
        img = np.random.default_rng(seed).integers(
            0, 256, (h, w), dtype=np.uint8
        )
        out = J.decode_jpeg(
            J.encode_jpeg_hierarchical(img, levels=levels, quality=quality)
        )
        assert np.array_equal(out["pixels"][:, :, 0], img)

    run()
