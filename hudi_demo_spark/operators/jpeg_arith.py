"""Arithmetic-coded JPEG (ITU-T T.81 Annex D QM-coder + Annex F
conditioning) — closes the one remaining codec gap (`operators/jpeg.py`
previously raised for every SOFx with arithmetic entropy).

Scope: SOF9 (extended sequential DCT, arithmetic, 8- and 12-bit) and SOF10
(progressive arithmetic: DC first/refine, AC first/refine with the
Annex G.2 models) DECODE plus matching test-fixture ENCODERS, DAC
conditioning (DC L/U bounds, AC Kx), restart markers, interleaved and
single-component scans, 4:4:4 / 4:2:0 / grayscale. SOF11 (lossless
arithmetic) still raises `NotImplementedError` loudly — its Annex H.2
gradient-conditioned context table has no public reference
implementation to pin against and files are effectively nonexistent in
crawl corpora; honesty beats a plausibly-wrong decode.

Conformance: the coder is the T.81 Annex D state machine — the 113-state
probability estimation table (Table D.3) plus the fixed uniform state,
byte-stuffed output with carry propagation, and the Annex F DC/AC
statistical models (context layout per Tables F.4/F.5: DC contexts
conditioned on the previous diff's class, AC contexts per coefficient
index with the Kx split, magnitude-category trees, fixed-probability AC
signs) — in the register convention of the public IJG implementation
(jdarith.c/jcarith.c), the de-facto conformance reference. The encoder
and decoder are differentially pinned against the HUFFMAN coder: both
entropy-code the SAME quantized coefficients, so
decode(arith bytes) == decode(baseline bytes) bit-exactly — a cross-
model oracle a shared bug in the QM pair cannot satisfy, plus a
randomized QM-coder stress suite (carries, stuffed 0xFF runs, skewed
contexts). No external arithmetic decoder exists in this container;
the stream layout is additionally asserted structurally (marker
grammar, DAC payloads, stuff bytes).

Scale note: same execution shape as the Huffman decoders — pure-Python
per-payload work inside Arrow-batched `mapInPandas` stages, zero
shuffle. Arithmetic decode is inherently sequential per payload
(feedback through the interval registers), so parallelism comes from
the DataFrame partitioning across payloads, which is exactly where a
100 TB corpus has it.
"""

from __future__ import annotations

import struct

# T.81 Table D.3 probability estimation state machine (public standard
# table, identically reproduced in every conformant codec): per state
# (Qe, NMPS, NLPS, SWITCH). Index 113 is the fixed ~0.5 state used for
# AC signs (F.1.4.3.1) — it never adapts.
_QM = [
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1),
    (0x5A1D, 113, 113, 0),  # index 113: fixed non-adaptive ~0.5
]

FIXED_BIN = 113  # context index of the non-adaptive state

# statistics-area sizes per conditioning table (Annex F / IJG)
DC_STAT_BINS = 64
AC_STAT_BINS = 256


class ArithDecoder:
    """QM decoder over ONE entropy segment (already un-stuffed and
    marker-split by `_entropy_segments` — past the segment end the
    decoder feeds zero bytes, the Annex D convention for data exhausted
    at a marker). Contexts are caller-owned bytearrays: one byte per
    context, bit 7 = MPS sense, bits 0-6 = Table D.3 state index."""

    def __init__(self, data: bytes):
        self.data = data
        self.bp = 0
        self.c = 0
        self.a = 0
        self.ct = -16  # two byte-ins fill the C register, then A=0x10000

    def _byte(self) -> int:
        if self.bp < len(self.data):
            b = self.data[self.bp]
            self.bp += 1
            return b
        return 0  # zero-feed past the marker (D.2.7)

    def decode(self, st: bytearray, i: int) -> int:
        # deferred renormalization (F.2.2.4): runs at most twice per
        # decision, and performs register initialization on first call
        a = self.a
        while a < 0x8000:
            self.ct -= 1
            if self.ct < 0:
                self.c = ((self.c << 8) | self._byte()) & 0xFFFFFFFF
                self.ct += 8
                if self.ct < 0:
                    self.ct += 1
                    if self.ct == 0:
                        a = 0x8000  # doubled below -> 0x10000
            a <<= 1
        sval = st[i]
        qe, nmps, nlps, switch = _QM[sval & 0x7F]
        mps = sval >> 7
        a -= qe
        temp = a << self.ct
        if self.c < temp:
            # bottom subinterval (nominally MPS, size A-Qe)
            if a >= 0x8000:
                self.a = a
                return mps  # fast path: no renorm, no state change
            if a < qe:  # conditional exchange: bottom decodes LPS
                bit = mps ^ 1
                if switch:
                    mps ^= 1
                st[i] = (mps << 7) | nlps
            else:
                bit = mps
                st[i] = (mps << 7) | nmps
        else:
            # top subinterval (nominally LPS, size Qe)
            self.c -= temp
            if a < qe:  # conditional exchange: top decodes MPS
                bit = mps
                st[i] = (mps << 7) | nmps
            else:
                bit = mps ^ 1
                if switch:
                    mps ^= 1
                st[i] = (mps << 7) | nlps
            a = qe
        self.a = a  # renorm deferred to the next call's top loop
        return bit


class ArithEncoder:
    """QM encoder producing one entropy segment (Annex D.1). Carry is
    resolved by back-propagation over the raw byte list; 0xFF stuffing
    is a final syntactic pass (exactly what the decoder un-stuffs)."""

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.raw: list[int] = []

    def encode(self, st: bytearray, i: int, bit: int) -> None:
        sval = st[i]
        qe, nmps, nlps, switch = _QM[sval & 0x7F]
        mps = sval >> 7
        self.a -= qe
        if bit != mps:
            # code LPS: top subinterval unless exchanged
            if self.a >= qe:
                self.c += self.a
                self.a = qe
            if switch:
                mps ^= 1
            st[i] = (mps << 7) | nlps
        else:
            # code MPS: bottom subinterval unless exchanged
            if self.a >= 0x8000:
                return
            if self.a < qe:
                self.c += self.a
                self.a = qe
            st[i] = (mps << 7) | nmps
        while True:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
                self.ct = 8
            if self.a >= 0x8000:
                break

    def _carry(self) -> None:
        j = len(self.raw) - 1
        if j < 0:
            raise ValueError("QM encoder: carry out of an empty stream")
        while True:
            self.raw[j] += 1
            if self.raw[j] <= 0xFF:
                return
            self.raw[j] = 0
            j -= 1
            if j < 0:
                raise ValueError("QM encoder: carry past stream start")

    def _byteout(self) -> None:
        t = self.c >> 19
        if t > 0xFF:
            self._carry()
            t &= 0xFF
        self.raw.append(t)
        self.c &= 0x7FFFF

    def flush(self) -> bytes:
        """Terminate (D.1.8): point C at the in-interval value with the
        most trailing zeros, push out the remaining bits, drop trailing
        zero bytes, stuff 0x00 after every 0xFF."""
        t = (self.a - 1 + self.c) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        if self.c > 0x7FFFFFF:
            self._carry()
            self.c &= 0x7FFFFFF
        self.raw.append((self.c >> 19) & 0xFF)
        self.raw.append((self.c >> 11) & 0xFF)
        while self.raw and self.raw[-1] == 0:
            self.raw.pop()
        out = bytearray()
        for b in self.raw:
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
        return bytes(out)


class _Stats:
    """Per-scan statistics areas + DC predictors, reset at restarts
    (F.2.1.3.1: a restart reinitializes statistics AND registers)."""

    def __init__(self, n_dc_tables: int = 4, n_ac_tables: int = 4):
        self.dc = [bytearray(DC_STAT_BINS) for _ in range(n_dc_tables)]
        self.ac = [bytearray(AC_STAT_BINS) for _ in range(n_ac_tables)]
        self.fixed = bytearray([FIXED_BIN])
        self.dc_context: dict[int, int] = {}
        self.last_dc: dict[int, int] = {}

    def reset(self):
        for b in self.dc:
            b[:] = bytes(len(b))
        for b in self.ac:
            b[:] = bytes(len(b))
        self.fixed[0] = FIXED_BIN
        for k in self.dc_context:
            self.dc_context[k] = 0
        for k in self.last_dc:
            self.last_dc[k] = 0


def _dc_class(m: int, sign: int, cond_l: int, cond_u: int) -> int:
    """F.1.4.4.1.2: classify a DC difference magnitude category for the
    NEXT block's conditioning context."""
    if m < ((1 << cond_l) >> 1):
        return 0
    if m > ((1 << cond_u) >> 1):
        return 12 + sign * 4
    return 4 + sign * 4


def _decode_dc(dec, stats, ci, dc_tbl, cond_l, cond_u) -> int:
    """F.2.4.1: one DC difference; returns the new DC value."""
    st = stats.dc[dc_tbl]
    base = stats.dc_context.setdefault(ci, 0)
    stats.last_dc.setdefault(ci, 0)
    if dec.decode(st, base) == 0:
        stats.dc_context[ci] = 0
        return stats.last_dc[ci]
    sign = dec.decode(st, base + 1)
    pos = base + 2 + sign
    m = dec.decode(st, pos)
    if m:
        pos = 20  # Table F.4: X1
        while dec.decode(st, pos):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arith JPEG: DC magnitude overflow")
            pos += 1
    stats.dc_context[ci] = _dc_class(m, sign, cond_l, cond_u)
    v = m
    pos += 14  # Table F.4: magnitude bits follow the category tree
    while m > 1:
        m >>= 1
        if dec.decode(st, pos):
            v |= m
    v += 1
    if sign:
        v = -v
    stats.last_dc[ci] += v
    return stats.last_dc[ci]


def _decode_ac(dec, stats, ac_tbl, kx, coef: list) -> None:
    """F.2.4.2: AC coefficients of one block into `coef` (natural
    order, zigzag walk)."""
    from hudi_demo_spark.operators.jpeg import ZIGZAG

    st = stats.ac[ac_tbl]
    k = 1
    while k <= 63:
        base = 3 * (k - 1)
        if dec.decode(st, base):  # EOB
            return
        while dec.decode(st, base + 1) == 0:
            base += 3
            k += 1
            if k > 63:
                raise ValueError("arith JPEG: AC index overflow")
        sign = dec.decode(stats.fixed, 0)
        pos = base + 2
        m = dec.decode(st, pos)
        if m:
            if dec.decode(st, pos):
                m = 2
                pos = 189 if k <= kx else 217  # Table F.5: X regions
                while dec.decode(st, pos):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError(
                            "arith JPEG: AC magnitude overflow"
                        )
                    pos += 1
        v = m
        pos += 14
        while m > 1:
            m >>= 1
            if dec.decode(st, pos):
                v |= m
        v += 1
        coef[ZIGZAG[k]] = -v if sign else v
        k += 1


def _encode_dc(enc, stats, ci, dc_tbl, cond_l, cond_u, dc: int) -> None:
    st = stats.dc[dc_tbl]
    base = stats.dc_context.setdefault(ci, 0)
    diff = dc - stats.last_dc.setdefault(ci, 0)
    stats.last_dc[ci] = dc
    if diff == 0:
        enc.encode(st, base, 0)
        stats.dc_context[ci] = 0
        return
    enc.encode(st, base, 1)
    sign = 1 if diff < 0 else 0
    t = -diff if sign else diff
    enc.encode(st, base + 1, sign)
    t -= 1
    pos = base + 2 + sign
    m = 0
    if t:
        enc.encode(st, pos, 1)
        m = 1
        pos = 20
        v2 = t
        while v2 > 1:
            v2 >>= 1
            enc.encode(st, pos, 1)
            m <<= 1
            pos += 1
    enc.encode(st, pos, 0)
    stats.dc_context[ci] = _dc_class(m, sign, cond_l, cond_u)
    pos += 14
    while m > 1:
        m >>= 1
        enc.encode(st, pos, 1 if (t & m) else 0)


def _encode_ac(enc, stats, ac_tbl, kx, zz: list) -> None:
    """zz: 64-list in zigzag order."""
    st = stats.ac[ac_tbl]
    ke = 63
    while ke > 0 and zz[ke] == 0:
        ke -= 1
    k = 1
    while k <= ke:
        base = 3 * (k - 1)
        enc.encode(st, base, 0)  # not EOB
        while zz[k] == 0:
            enc.encode(st, base + 1, 0)
            base += 3
            k += 1
        enc.encode(st, base + 1, 1)
        t = zz[k]
        sign = 1 if t < 0 else 0
        if sign:
            t = -t
        enc.encode(stats.fixed, 0, sign)
        t -= 1
        pos = base + 2
        m = 0
        if t:
            enc.encode(st, pos, 1)
            m = 1
            v2 = t
            if v2 > 1:
                enc.encode(st, pos, 1)
                m = 2
                pos = 189 if k <= kx else 217
                while v2 > 3:
                    v2 >>= 1
                    enc.encode(st, pos, 1)
                    m <<= 1
                    pos += 1
        enc.encode(st, pos, 0)
        pos += 14
        while m > 1:
            m >>= 1
            enc.encode(st, pos, 1 if (t & m) else 0)
        k += 1
    if k <= 63:
        enc.encode(st, 3 * (k - 1), 1)  # EOB


def decode_scan_arith(
    segs, scan_comps, smap, dac, coefs, restart_interval,
    mcux, mcuy, frame,
):
    """One SOF9 sequential scan over pre-split entropy segments.
    `dac` = {"dc": {tbl: (L, U)}, "ac": {tbl: Kx}} from the DAC marker
    (defaults L=0, U=1, Kx=5 per F.1.4.4.1.2/F.1.4.4.2)."""
    stats = _Stats()
    seg_i = 0
    dec = ArithDecoder(segs[0])
    n_done = 0

    def block(ci, c, by, bx):
        dc_tbl, ac_tbl = smap[c["id"]]
        cond_l, cond_u = dac["dc"].get(dc_tbl, (0, 1))
        kx = dac["ac"].get(ac_tbl, 5)
        blk = [0] * 64
        blk[0] = _decode_dc(dec, stats, ci, dc_tbl, cond_l, cond_u)
        _decode_ac(dec, stats, ac_tbl, kx, blk)
        coefs[ci][by, bx] = blk

    if len(scan_comps) > 1:
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and n_done and \
                        n_done % restart_interval == 0:
                    seg_i += 1
                    if seg_i >= len(segs):
                        raise ValueError("JPEG: missing restart segment")
                    dec = ArithDecoder(segs[seg_i])
                    stats.reset()
                n_done += 1
                for ci, c in scan_comps:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            block(ci, c, my * c["v"] + by, mx * c["h"] + bx)
    else:
        from hudi_demo_spark.operators.jpeg import _comp_grid

        ci, c = scan_comps[0]
        nby, nbx = _comp_grid(frame, c)
        for by in range(nby):
            for bx in range(nbx):
                if restart_interval and n_done and \
                        n_done % restart_interval == 0:
                    seg_i += 1
                    if seg_i >= len(segs):
                        raise ValueError("JPEG: missing restart segment")
                    dec = ArithDecoder(segs[seg_i])
                    stats.reset()
                n_done += 1
                block(ci, c, by, bx)


def encode_jpeg_arith(
    arr, quality: int = 85, restart_interval: int = 0,
    subsampling: str = "444", kx: int = 5,
) -> bytes:
    """uint8 (h, w, 3) RGB or (h, w) grayscale → SOF9 arithmetic-coded
    JFIF bytes carrying the SAME quantized coefficients as
    `encode_jpeg_baseline(arr, quality)` — the cross-entropy-coder
    differential: decode_jpeg of both streams must be bit-identical.
    Emits an explicit DAC marker (default conditioning L=0 U=1 plus the
    caller's Kx) and DRI/RSTn when `restart_interval` is set."""
    from hudi_demo_spark.operators.jpeg import ZIGZAG, _quantized_zz

    qts, comps_zz, comps_hv, mcux, mcuy, h, w = _quantized_zz(
        arr, quality, subsampling
    )
    ncomp = len(comps_zz)

    def seg(marker: int, body: bytes) -> bytes:
        return (
            bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body
        )

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, tbl in enumerate(qts[: 2 if ncomp == 3 else 1]):
        out += seg(
            0xDB, bytes([tid]) + bytes(tbl[ZIGZAG[z]] for z in range(64))
        )
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        ch, cv = comps_hv[ci]
        sof += bytes([ci + 1, (ch << 4) | cv, 0 if ci == 0 else 1])
    out += seg(0xC9, sof)  # SOF9: extended sequential, arithmetic
    # DAC: DC conditioning for table 0 (and 1 when chroma), AC Kx
    dac = bytearray()
    for tbl in range(2 if ncomp == 3 else 1):
        dac += bytes([0x00 | tbl, (1 << 4) | 0])  # Tc=0: U=1, L=0
        dac += bytes([0x10 | tbl, kx])  # Tc=1: Kx
    out += seg(0xCC, bytes(dac))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        tbl = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tbl << 4) | tbl])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    stats = _Stats()
    enc = ArithEncoder()
    n_done = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_done and \
                    n_done % restart_interval == 0:
                out += enc.flush()
                out += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                enc = ArithEncoder()
                stats.reset()
            n_done += 1
            for ci in range(ncomp):
                ch, cv = comps_hv[ci]
                tbl = 0 if ci == 0 else 1
                for by in range(cv):
                    for bx in range(ch):
                        zz = comps_zz[ci][my * cv + by][mx * ch + bx]
                        _encode_dc(enc, stats, ci, tbl, 0, 1, zz[0])
                        _encode_ac(enc, stats, tbl, kx, zz)
    out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------
# SOF10: progressive DCT with arithmetic entropy (Annex G.2)
# ---------------------------------------------------------------------

def decode_scan_arith_progressive(
    segs, scan_comps, smap, dac, coefs, restart_interval,
    mcux, mcuy, frame, ss, se, ah, al,
):
    """One SOF10 progressive scan: DC first/refine (interleaved MCU
    walk) and AC first/refine (single-component own-grid walk), with
    the Annex G.2 arithmetic models — DC first is the sequential DC
    model with the decoded diff scaled <<Al; DC refine is ONE
    fixed-probability bit per block; AC first is the sequential AC
    model over [Ss..Se] scaled <<Al; AC refine distinguishes
    previously-nonzero coefficients (one correction bit, context st+2)
    from newly-nonzero ones (context st+1 + fixed-probability sign),
    with the EOB decision only past EOBx, the previous stage's
    end-of-block index."""
    from hudi_demo_spark.operators.jpeg import ZIGZAG, _comp_grid

    stats = _Stats()
    seg_i = 0
    dec = ArithDecoder(segs[0])
    n_done = 0
    p1 = 1 << al
    m1 = -p1

    def maybe_restart():
        nonlocal seg_i, dec, n_done
        if restart_interval and n_done and n_done % restart_interval == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise ValueError("JPEG: missing restart segment")
            dec = ArithDecoder(segs[seg_i])
            stats.reset()
        n_done += 1

    if ss == 0:
        # DC scan (first or refinement), MCU-interleaved like Huffman
        for my in range(mcuy):
            for mx in range(mcux):
                maybe_restart()
                for ci, c in scan_comps:
                    dc_tbl = smap[c["id"]][0]
                    cond_l, cond_u = dac["dc"].get(dc_tbl, (0, 1))
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = coefs[ci][my * c["v"] + by, mx * c["h"] + bx]
                            if ah == 0:
                                dc = _decode_dc(
                                    dec, stats, ci, dc_tbl, cond_l, cond_u
                                )
                                blk[0] = dc << al
                            elif dec.decode(stats.fixed, 0):
                                blk[0] |= p1
        return
    # AC scan: always single-component over its own block grid
    ci, c = scan_comps[0]
    ac_tbl = smap[c["id"]][1]
    kx = dac["ac"].get(ac_tbl, 5)
    st = stats.ac[ac_tbl]
    nby, nbx = _comp_grid(frame, c)
    for by in range(nby):
        for bx in range(nbx):
            maybe_restart()
            blk = coefs[ci][by, bx]
            if ah == 0:
                # AC first pass: sequential model over the band, <<Al
                k = ss
                while k <= se:
                    base = 3 * (k - 1)
                    if dec.decode(st, base):
                        break  # EOB
                    while dec.decode(st, base + 1) == 0:
                        base += 3
                        k += 1
                        if k > se:
                            raise ValueError(
                                "JPEG: arith AC band overflow"
                            )
                    sign = dec.decode(stats.fixed, 0)
                    pos = base + 2
                    m = dec.decode(st, pos)
                    if m:
                        if dec.decode(st, pos):
                            m = 2
                            pos = 189 if k <= kx else 217
                            while dec.decode(st, pos):
                                m <<= 1
                                if m == 0x8000:
                                    raise ValueError(
                                        "JPEG: arith AC magnitude overflow"
                                    )
                                pos += 1
                    v = m
                    pos += 14
                    while m > 1:
                        m >>= 1
                        if dec.decode(st, pos):
                            v |= m
                    v += 1
                    blk[ZIGZAG[k]] = (-v if sign else v) << al
                    k += 1
            else:
                # AC refinement (G.2.3)
                kex = se
                while kex > 0 and blk[ZIGZAG[kex]] == 0:
                    kex -= 1
                k = ss
                while k <= se:
                    base = 3 * (k - 1)
                    if k > kex and dec.decode(st, base):
                        break  # EOB
                    while True:
                        cur = blk[ZIGZAG[k]]
                        if cur:  # previously nonzero: correction bit
                            if dec.decode(st, base + 2):
                                blk[ZIGZAG[k]] = (
                                    cur + m1 if cur < 0 else cur + p1
                                )
                            break
                        if dec.decode(st, base + 1):  # newly nonzero
                            blk[ZIGZAG[k]] = (
                                m1 if dec.decode(stats.fixed, 0) else p1
                            )
                            break
                        base += 3
                        k += 1
                        if k > se:
                            raise ValueError(
                                "JPEG: arith AC refine overflow"
                            )
                    k += 1


def encode_jpeg_arith_progressive(
    arr, quality: int = 85, scans: list | None = None,
    restart_interval: int = 0, subsampling: str = "444", kx: int = 5,
) -> bytes:
    """uint8 RGB/gray → SOF10 progressive arithmetic JFIF bytes over
    the SAME quantized coefficients as the Huffman encoders (spectral
    selection + successive approximation, QM entropy) — so
    decode_jpeg(SOF10 stream) must equal decode_jpeg(baseline stream)
    bit-exactly. Default scan scripts mirror encode_jpeg_progressive."""
    from hudi_demo_spark.operators.jpeg import (
        _comp_grid, _pt, _quantized_zz,
    )

    qts, comps_zz, comps_hv, mcux, mcuy, h, w = _quantized_zz(
        arr, quality, subsampling
    )
    ncomp = len(comps_zz)
    hmax = max(hv[0] for hv in comps_hv)
    vmax = max(hv[1] for hv in comps_hv)
    if scans is None:
        if ncomp == 1:
            scans = [
                ([0], 0, 0, 0, 1), ([0], 1, 5, 0, 2), ([0], 6, 63, 0, 2),
                ([0], 1, 63, 2, 1), ([0], 0, 0, 1, 0), ([0], 1, 63, 1, 0),
            ]
        else:
            scans = [
                ([0, 1, 2], 0, 0, 0, 1), ([0], 1, 5, 0, 2),
                ([2], 1, 63, 0, 1), ([1], 1, 63, 0, 1),
                ([0], 6, 63, 0, 2), ([0], 1, 63, 2, 1),
                ([0, 1, 2], 0, 0, 1, 0), ([2], 1, 63, 1, 0),
                ([1], 1, 63, 1, 0), ([0], 1, 63, 1, 0),
            ]

    def seg(marker: int, body: bytes) -> bytes:
        return (
            bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body
        )

    from hudi_demo_spark.operators.jpeg import ZIGZAG

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tid, tbl in enumerate(qts[: 2 if ncomp == 3 else 1]):
        out += seg(
            0xDB, bytes([tid]) + bytes(tbl[ZIGZAG[z]] for z in range(64))
        )
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        ch, cv = comps_hv[ci]
        sof += bytes([ci + 1, (ch << 4) | cv, 0 if ci == 0 else 1])
    out += seg(0xCA, sof)  # SOF10
    dacb = bytearray()
    for tbl in range(2 if ncomp == 3 else 1):
        dacb += bytes([0x00 | tbl, (1 << 4) | 0])
        dacb += bytes([0x10 | tbl, kx])
    out += seg(0xCC, bytes(dacb))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))

    frame = {
        "w": w, "h": h,
        "comps": [
            {"id": ci + 1, "h": comps_hv[ci][0], "v": comps_hv[ci][1]}
            for ci in range(ncomp)
        ],
    }
    for comp_idx, ss, se, ah, al in scans:
        sos = bytes([len(comp_idx)])
        for ci in comp_idx:
            tbl = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (tbl << 4) | tbl])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        stats = _Stats()
        enc = ArithEncoder()
        n_done = 0
        rst = 0
        p1 = 1 << al

        def flush_restart():
            nonlocal enc, n_done, rst
            if restart_interval and n_done and \
                    n_done % restart_interval == 0:
                out.extend(enc.flush())
                out.extend(bytes([0xFF, 0xD0 + rst % 8]))
                rst += 1
                enc = ArithEncoder()
                stats.reset()
            n_done += 1

        if ss == 0:
            for my in range(mcuy):
                for mx in range(mcux):
                    flush_restart()
                    for ci in comp_idx:
                        ch, cv = comps_hv[ci]
                        tbl = 0 if ci == 0 else 1
                        for by in range(cv):
                            for bx in range(ch):
                                v = comps_zz[ci][my * cv + by][mx * ch + bx][0]
                                if ah == 0:
                                    _encode_dc(
                                        enc, stats, ci, tbl, 0, 1, v >> al
                                    )
                                else:
                                    enc.encode(
                                        stats.fixed, 0, (v >> al) & 1
                                    )
        else:
            ci = comp_idx[0]
            tbl = 0 if ci == 0 else 1
            st = stats.ac[tbl]
            nby, nbx = _comp_grid(frame, frame["comps"][ci])
            for by in range(nby):
                for bx in range(nbx):
                    flush_restart()
                    zz = comps_zz[ci][by][bx]
                    if ah == 0:
                        ke = se
                        while ke >= ss and _pt(zz[ke], al) == 0:
                            ke -= 1
                        k = ss
                        while k <= ke:
                            base = 3 * (k - 1)
                            enc.encode(st, base, 0)  # not EOB
                            while _pt(zz[k], al) == 0:
                                enc.encode(st, base + 1, 0)
                                base += 3
                                k += 1
                            enc.encode(st, base + 1, 1)
                            t = _pt(zz[k], al)
                            sign = 1 if t < 0 else 0
                            if sign:
                                t = -t
                            enc.encode(stats.fixed, 0, sign)
                            t -= 1
                            pos = base + 2
                            m = 0
                            if t:
                                enc.encode(st, pos, 1)
                                m = 1
                                v2 = t
                                if v2 > 1:
                                    enc.encode(st, pos, 1)
                                    m = 2
                                    pos = 189 if k <= kx else 217
                                    while v2 > 3:
                                        v2 >>= 1
                                        enc.encode(st, pos, 1)
                                        m <<= 1
                                        pos += 1
                            enc.encode(st, pos, 0)
                            pos += 14
                            while m > 1:
                                m >>= 1
                                enc.encode(st, pos, 1 if (t & m) else 0)
                            k += 1
                        if k <= se:
                            enc.encode(st, 3 * (k - 1), 1)  # EOB
                    else:
                        ke = se
                        while ke >= ss and _pt(zz[ke], al) == 0:
                            ke -= 1
                        kex = ke
                        while kex > 0 and _pt(zz[kex], al + 1) == 0:
                            kex -= 1
                        k = ss
                        while k <= ke:
                            base = 3 * (k - 1)
                            if k > kex:
                                enc.encode(st, base, 0)  # not EOB yet
                            while True:
                                t = _pt(zz[k], al)
                                if t:
                                    if t < -1 or t > 1:
                                        # previously nonzero: one bit
                                        enc.encode(
                                            st, base + 2, abs(t) & 1
                                        )
                                    else:
                                        enc.encode(st, base + 1, 1)
                                        enc.encode(
                                            stats.fixed, 0,
                                            1 if t < 0 else 0,
                                        )
                                    break
                                enc.encode(st, base + 1, 0)
                                base += 3
                                k += 1
                            k += 1
                        if k <= se:
                            enc.encode(st, 3 * (k - 1), 1)  # EOB
        out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------
# 12-bit extended sequential (SOF1 Huffman / SOF9 arithmetic) fixture
# encoder — grayscale, the real-world shape of deep-sample DCT JPEGs
# (medical/scientific); B.2.2 allows 8- or 12-bit for both frames.
# ---------------------------------------------------------------------

def encode_jpeg_ext(
    arr, quality: int = 100, arith: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(h, w) integer samples in [0, 4095] → 12-bit GRAYSCALE
    extended-sequential JFIF bytes: SOF1 (Huffman over the flat
    all-symbols table — 12-bit DC categories reach SSSS=15, beyond the
    Annex K 8-bit tables) or SOF9 (arithmetic) over IDENTICAL quantized
    coefficients, so the two streams decode bit-equal. The DQT is
    written in 16-bit Pq=1 form (the 12-bit convention) regardless of
    entry magnitude, exercising that parse path; at quality=100 the
    all-ones table makes block-constant images decode EXACTLY."""
    import numpy as np

    from hudi_demo_spark.operators.jpeg import (
        _BitWriter, _K1_LUMA, ZIGZAG, _csize, _edge_pad, _enc_codes,
        _idct_basis, _quality_scale,
    )
    from hudi_demo_spark.operators.jpeg import _FLAT_BITS, _FLAT_HUFF

    a = np.asarray(arr)
    if a.ndim != 2:
        raise ValueError("12-bit fixture encoder is grayscale-only")
    h, w = a.shape
    q = _quality_scale(_K1_LUMA, quality)
    A = _idct_basis()
    nby, nbx = -(-h // 8), -(-w // 8)
    p = _edge_pad(a.astype(np.float64) - 2048.0, nby * 8, nbx * 8)
    qm = np.array(q, dtype=np.float64).reshape(8, 8)
    blocks = []
    for by in range(nby):
        for bx in range(nbx):
            blk = p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
            qz = np.round((A @ blk @ A.T) / qm).astype(int)
            flat = qz.ravel()
            blocks.append([int(flat[ZIGZAG[z]]) for z in range(64)])

    def seg(marker: int, body: bytes) -> bytes:
        return (
            bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body
        )

    out = bytearray(b"\xff\xd8")
    dqt = bytes([0x10])  # Pq=1 (16-bit entries), Tq=0
    for z in range(64):
        dqt += struct.pack(">H", q[ZIGZAG[z]])
    out += seg(0xDB, dqt)
    sof = struct.pack(">BHHB", 12, h, w, 1) + bytes([1, 0x11, 0])
    out += seg(0xC9 if arith else 0xC1, sof)
    if arith:
        out += seg(0xCC, bytes([0x00, 0x10, 0x10, 5]))  # L=0 U=1, Kx=5
    else:
        for tc in (0, 1):
            out += seg(
                0xC4,
                bytes([tc << 4]) + bytes(_FLAT_BITS[1:]) + bytes(_FLAT_HUFF),
            )
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))

    if arith:
        stats = _Stats()
        enc = ArithEncoder()
        n_done = 0
        rst = 0
        for zz in blocks:
            if restart_interval and n_done and \
                    n_done % restart_interval == 0:
                out += enc.flush()
                out += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                enc = ArithEncoder()
                stats.reset()
            n_done += 1
            _encode_dc(enc, stats, 0, 0, 0, 1, zz[0])
            _encode_ac(enc, stats, 0, 5, zz)
        out += enc.flush()
    else:
        tab = _enc_codes(_FLAT_BITS, _FLAT_HUFF)
        wtr = _BitWriter()
        pred = 0
        n_done = 0
        rst = 0
        for zz in blocks:
            if restart_interval and n_done and \
                    n_done % restart_interval == 0:
                wtr.flush()
                out += bytes(wtr.out)
                out += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                wtr = _BitWriter()
                pred = 0
            n_done += 1
            diff = zz[0] - pred
            pred = zz[0]
            t = _csize(diff)
            code, length = tab[t]
            wtr.write(code, length)
            if t:
                wtr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
            run = 0
            last = 63
            while last > 0 and zz[last] == 0:
                last -= 1
            for k in range(1, last + 1):
                v = zz[k]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = tab[0xF0]
                    wtr.write(code, length)
                    run -= 16
                sb = _csize(v)
                code, length = tab[(run << 4) | sb]
                wtr.write(code, length)
                wtr.write(v if v >= 0 else v + (1 << sb) - 1, sb)
                run = 0
            if last < 63:
                code, length = tab[0x00]
                wtr.write(code, length)
        wtr.flush()
        out += bytes(wtr.out)
    out += b"\xff\xd9"
    return bytes(out)
