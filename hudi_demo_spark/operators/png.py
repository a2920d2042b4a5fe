"""Pure numpy+stdlib PNG decoder — no codec libraries.

PNG is DEFLATE (stdlib `zlib`) over per-scanline filtered samples, so
unlike JPEG's entropy coding it decodes with nothing beyond the Python
standard library: chunk walk (IHDR/PLTE/tRNS/IDAT/IEND), zlib inflate,
scanline unfiltering (types 0-4 incl. Paeth), and sample demux for
8/16-bit gray, gray+alpha, RGB, RGBA and paletted images. Interlaced
(Adam7) streams raise NotImplementedError — honest gap, loudly.

Output contract matches the other image decoders
(`multimodal.decode_ppm/decode_bmp/jpeg.decode_jpeg`): uint8 RGB
(h, w, 3); 16-bit samples scale down, alpha composites over black
(the convention every downstream feature treats payloads with).

Fixture encoder `encode_png` (filter 0, non-interlaced) serves the
differential gates; decode of externally-produced streams exercises
the unfilter paths via the filtered variants the tests synthesize.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> dict:
    """PNG → {'kind': 'image', 'width', 'height', 'pixels': uint8
    (h, w, 3)}. Supports color types 0 (gray), 2 (RGB), 3 (palette),
    4 (gray+alpha), 6 (RGBA) at bit depths 8/16 (palette: 1/2/4/8).
    Raises NotImplementedError for Adam7 interlacing, ValueError for
    corrupt streams."""
    import numpy as np

    if payload[:8] != _SIG:
        raise ValueError("not a PNG (missing signature)")
    pos = 8
    ihdr = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        length = struct.unpack_from(">I", payload, pos)[0]
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if comp or filt:
                raise ValueError("PNG: unknown compression/filter method")
            if interlace:
                raise NotImplementedError("Adam7-interlaced PNG")
            ihdr = (w, h, depth, color)
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + crc
    if ihdr is None or not idat:
        raise ValueError("PNG: missing IHDR/IDAT")
    w, h, depth, color = ihdr
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"PNG: bad color type {color}")
    if color == 3:
        if depth not in (1, 2, 4, 8):
            raise ValueError("PNG: bad palette depth")
        if palette is None:
            raise ValueError("PNG: paletted image missing PLTE")
    elif depth not in (8, 16):
        raise NotImplementedError(f"PNG: depth {depth} for color {color}")
    raw = zlib.decompress(bytes(idat))
    bits_pp = channels * depth
    stride = (w * bits_pp + 7) // 8
    bpp = max(1, bits_pp // 8)  # filter unit (bytes per pixel, min 1)
    if len(raw) < (stride + 1) * h:
        raise ValueError("PNG: truncated pixel data")
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.intp)
    for y in range(h):
        ft = raw[pos]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=pos + 1
        ).astype(np.intp)
        pos += 1 + stride
        if ft == 0:
            cur = line
        elif ft == 1:  # Sub
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ft == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ft == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (cur[x] + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"PNG: bad filter type {ft}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    # demux samples
    if color == 3:
        if depth < 8:
            # unpack sub-byte palette indices, MSB first
            bits = np.unpackbits(out, axis=1)[:, : w * depth]
            idx = bits.reshape(h, w, depth)
            weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
            samples = (idx * weights).sum(axis=2).astype(np.uint8)
        else:
            samples = out[:, :w]
        if int(samples.max(initial=0)) >= len(palette):
            raise ValueError("PNG: palette index out of range")
        return {"kind": "image", "width": w, "height": h,
                "pixels": palette[samples]}
    if depth == 8:
        px = out[:, : w * channels].reshape(h, w, channels)
    else:
        px16 = out[:, : w * channels * 2].reshape(h, w * channels, 2)
        px = (
            ((px16[:, :, 0].astype(np.uint16) << 8) | px16[:, :, 1]) >> 8
        ).astype(np.uint8).reshape(h, w, channels)
    if color == 0:
        g = px[:, :, 0]
        rgb = np.stack([g, g, g], axis=2)
    elif color == 2:
        rgb = px
    elif color == 4:
        g, a = px[:, :, 0].astype(np.uint16), px[:, :, 1].astype(np.uint16)
        g = ((g * a) // 255).astype(np.uint8)
        rgb = np.stack([g, g, g], axis=2)
    else:  # 6: RGBA over black
        a = px[:, :, 3].astype(np.uint16)
        rgb = (
            (px[:, :, :3].astype(np.uint16) * a[:, :, None]) // 255
        ).astype(np.uint8)
    return {"kind": "image", "width": w, "height": h, "pixels": rgb}


def encode_png(arr, filter_type: int = 0) -> bytes:
    """uint8 (h, w, 3) RGB or (h, w) gray → PNG bytes (8-bit,
    non-interlaced; `filter_type` 0-4 applies that filter to every
    scanline, exercising each unfilter path in tests)."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    h, w = a.shape[:2]
    channels = 1 if gray else 3
    flat = a.reshape(h, w * channels).astype(np.intp)
    bpp = channels
    lines = bytearray()
    prev = np.zeros(w * channels, dtype=np.intp)
    for y in range(h):
        cur = flat[y]
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            left = np.concatenate([np.zeros(bpp, dtype=np.intp), cur[:-bpp]])
            enc = (cur - left) & 0xFF
        elif filter_type == 2:
            enc = (cur - prev) & 0xFF
        elif filter_type == 3:
            left = np.concatenate([np.zeros(bpp, dtype=np.intp), cur[:-bpp]])
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        elif filter_type == 4:
            enc = np.empty_like(cur)
            for x in range(len(cur)):
                left = int(cur[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                enc[x] = (int(cur[x]) - _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError("filter_type must be 0-4")
        lines.append(filter_type)
        lines += bytes(enc.astype(np.uint8))
        prev = cur

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0 if gray else 2, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + chunk(b"IEND", b"")
    )
