"""Pure numpy+stdlib GIF decoder — no codec libraries.

GIF is LZW (variable-width codes, LSB-first bit packing) over palette
indices, so like PNG it decodes with nothing beyond the standard
library: header + logical screen descriptor, global/local color
tables, extension-block skip, image descriptor, LZW decompress,
optional interlace de-pass. Decodes the FIRST frame of an animation
(the corpus-dedup/feature use case treats a GIF as its poster frame;
frame_sample_plan handles multi-frame sampling at the plan level).

Output contract matches the other image decoders
(`multimodal.decode_ppm/decode_bmp`, `jpeg.decode_jpeg`,
`png.decode_png`): uint8 RGB (h, w, 3). A GCE transparent index is
composited over black, the convention every downstream feature uses.

Fixture encoder `encode_gif` emits a valid GIF87a/89a stream using the
classic no-compression LZW trick (literal codes with periodic Clear
codes so the code width never grows) — enough to differentially gate
the decoder bit-for-bit, since GIF is lossless over palette indices.
"""

from __future__ import annotations

import struct


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    """GIF-flavor LZW: variable code width starting at min+1, growing
    when the dict fills a width, reset by Clear; codes packed LSB-first."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    dict_base = [(i,) for i in range(clear)] + [None, None]
    table = list(dict_base)
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < width:
            if pos >= len(data):
                return out  # truncated stream: return what decoded
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(dict_base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return out
        if prev is None:
            if code >= len(table) or table[code] is None:
                raise ValueError(f"corrupt LZW stream: code {code}")
            entry = table[code]
        elif code < len(table) and table[code] is not None:
            entry = table[code]
            table.append(prev + (entry[0],))
        elif code == len(table):
            entry = prev + (prev[0],)
            table.append(entry)
        else:
            raise ValueError(f"corrupt LZW stream: code {code}")
        out.extend(entry)
        if prev is not None and len(table) >= (1 << width) and width < 12:
            width += 1
        prev = entry
    return out


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> dict:
    """GIF → {'kind': 'image', 'width', 'height', 'pixels': uint8
    (h, w, 3)} — first frame, transparency composited over black.
    Raises ValueError on a malformed stream."""
    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = payload[pos:pos + 3 * n]
        pos += 3 * n
    transparent = None
    while pos < len(payload):
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer before any image
            raise ValueError("GIF contains no image data")
        if b == 0x21:  # extension: label + sub-blocks
            label = payload[pos]
            pos += 1
            if label == 0xF9 and payload[pos] >= 4:
                flags = payload[pos + 1]
                if flags & 0x01:
                    transparent = payload[pos + 4]
            while payload[pos]:  # skip sub-blocks
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        _left, _top, w, h, ipacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = payload[pos:pos + 3 * n]
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image has no color table")
        min_code = payload[pos]
        pos += 1
        chunks = []
        while payload[pos]:
            ln = payload[pos]
            chunks.append(payload[pos + 1:pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = _lzw_decode(b"".join(chunks), min_code)
        if len(idx) < w * h:
            raise ValueError("GIF pixel data truncated")
        arr = np.frombuffer(
            bytes(idx[: w * h]), dtype=np.uint8
        ).reshape(h, w)
        if ipacked & 0x40:  # Adam-less GIF interlace: 4 row passes
            out_rows = np.empty_like(arr)
            src = 0
            for start, step in _INTERLACE_PASSES:
                for r in range(start, h, step):
                    out_rows[r] = arr[src]
                    src += 1
            arr = out_rows
        pal = np.frombuffer(ct, dtype=np.uint8).reshape(-1, 3)
        px = pal[arr]
        if transparent is not None and transparent < len(pal):
            px = px.copy()
            px[arr == transparent] = 0
        del sw, sh
        return {"kind": "image", "width": w, "height": h, "pixels": px}
    raise ValueError("GIF stream ended without image data")


def encode_gif(
    indices, palette, interlace: bool = False, transparent: int | None = None
) -> bytes:
    """Fixture encoder: indexed image (h, w uint8 array, values <
    len(palette)) + palette [(r, g, b), ...] → GIF bytes. Uses
    literal-code LZW with periodic Clear codes (the classic
    no-compression encoder) — decoders must accept it, and losslessness
    makes the decode differential exact."""
    import numpy as np

    arr = np.asarray(indices, dtype=np.uint8)
    h, w = arr.shape
    ncolors = len(palette)
    bits = max(2, (ncolors - 1).bit_length())
    size_field = bits - 1
    table = bytearray()
    for i in range(1 << bits):
        r, g, b = palette[i] if i < ncolors else (0, 0, 0)
        table += bytes((r, g, b))
    out = bytearray(b"GIF89a" if transparent is not None else b"GIF87a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_field << 4) | size_field,
                       0, 0)
    out += table
    if transparent is not None:
        out += bytes((0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0))
    ipacked = 0x40 if interlace else 0
    out += bytes((0x2C,)) + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
    out += bytes((bits,))  # LZW minimum code size
    clear, end = 1 << bits, (1 << bits) + 1
    width = bits + 1
    # rows in transmit order
    if interlace:
        rows = []
        for start, step in _INTERLACE_PASSES:
            rows.extend(range(start, h, step))
        flat = arr[rows].ravel()
    else:
        flat = arr.ravel()
    # literal codes only; emit Clear before the implicit table would
    # force a width bump ((1<<width) - end - 1 literals fit per window)
    acc = 0
    nbits = 0
    data = bytearray()

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    budget = (1 << width) - end - 1
    for v in flat:
        if budget == 0:
            emit(clear)
            budget = (1 << width) - end - 1
        emit(int(v))
        budget -= 1
    emit(end)
    if nbits:
        data.append(acc & 0xFF)
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out += bytes((len(chunk),)) + chunk
    out += bytes((0, 0x3B))
    return bytes(out)
