"""Pure-stdlib baseline JPEG codec (VERDICT r6 stretch item 9).

Shrinks the env-blocked codec set to WebP/video: baseline sequential DCT
JPEG (SOF0) decodes and encodes with nothing beyond ``struct`` + ``math``,
implemented from the public ITU T.81 spec — markers, canonical Huffman
tables, zigzag, dequantize, 8x8 IDCT, chroma upsampling, BT.601 YCbCr.

Decoder supports: baseline DCT (SOF0), 1-component grayscale and
3-component YCbCr, arbitrary sampling factors up to 2x2 (covers 4:4:4,
4:2:2, 4:2:0), restart intervals, 8/16-bit DQT, multiple DHT/DQT segments,
APPn/COM skip. Progressive (SOF2) and arithmetic coding raise — honestly
out of scope.

Encoder emits spec-compliant baseline JPEG (Annex K quantization + Huffman
tables, quality-scaled), 4:4:4 or 4:2:0, grayscale or color — it exists so
the engine can round-trip test its own decoder (and generate fixtures)
without any external library; any external tool can read its output.

API matches codecs.py: decode returns (width, height, channels, pixels)
with pixels top-down row-major 8-bit samples. Per-payload byte functions;
the distributed story stays mapInPandas over Arrow batches
(operators/multimodal.py).
"""

from __future__ import annotations

import math
import struct

# --------------------------------------------------------------- constants

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

#: Annex K.1 base quantization tables (luminance, chrominance)
QT_LUM = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
QT_CHROM = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]

#: Annex K.3 typical Huffman tables: (bits[1..16], values)
HT_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
             list(range(12)))
HT_DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
               list(range(12)))
HT_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
HT_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

#: separable DCT basis: COS[u][x] = c(u)/2 * cos((2x+1)u*pi/16)
_COS = [
    [
        (math.sqrt(0.5) if u == 0 else 1.0) * 0.5
        * math.cos((2 * x + 1) * u * math.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
]


def _idct_2d(block: list[float]) -> list[float]:
    """8x8 inverse DCT, separable (rows then columns)."""
    tmp = [0.0] * 64
    for y in range(8):
        base = y * 8
        row = block[base: base + 8]
        for x in range(8):
            tmp[base + x] = sum(row[u] * _COS[u][x] for u in range(8))
    out = [0.0] * 64
    for x in range(8):
        col = [tmp[v * 8 + x] for v in range(8)]
        for y in range(8):
            out[y * 8 + x] = sum(col[v] * _COS[v][y] for v in range(8))
    return out


def _fdct_2d(block: list[float]) -> list[float]:
    """8x8 forward DCT, separable."""
    tmp = [0.0] * 64
    for y in range(8):
        base = y * 8
        row = block[base: base + 8]
        for u in range(8):
            tmp[base + u] = sum(row[x] * _COS[u][x] for x in range(8)) * 2.0
    out = [0.0] * 64
    for u in range(8):
        col = [tmp[v * 8 + u] for v in range(8)]
        for v in range(8):
            out[v * 8 + u] = sum(col[y] * _COS[v][y] for y in range(8)) * 0.5
    return out


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(code length, code) -> symbol, canonical Huffman (T.81 C.2)."""
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code length, code)."""
    return {v: k for k, v in _build_decode_table(bits, vals).items()}


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any real marker (leaves pos ON the 0xFF)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:  # real marker — entropy data exhausted; pad with 1s (T.81)
                self.acc = (self.acc << 8) | 0xFF
                self.n += 8
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bits(self, n: int) -> int:
        while self.n < n:
            self._fill()
        self.n -= n
        v = (self.acc >> self.n) & ((1 << n) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            if (length, code) in table:
                return table[(length, code)]
        raise ValueError("invalid Huffman code in entropy stream")

    def align(self) -> None:
        self.acc = 0
        self.n = 0


def _extend(v: int, t: int) -> int:
    """T.81 F.12: map a t-bit magnitude to its signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Baseline JPEG -> (width, height, channels, top-down RGB/gray bytes)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, list[int]] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    comps: list[dict] = []
    width = height = 0
    restart_interval = 0
    pos = 2
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", data[pos: pos + 2])[0]
        seg = data[pos + 2: pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if prec:
                    vals = list(struct.unpack(f">{64}H", seg[i: i + 128]))
                    i += 128
                else:
                    vals = list(seg[i: i + 64])
                    i += 64
                qt[tid] = vals
        elif marker == 0xC0:  # SOF0 baseline
            height, width = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c: 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline sequential DCT (SOF0) is supported, got SOF{marker - 0xC0}"
            )
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1: i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17: i + 17 + nv])
                (huff_ac if tc else huff_dc)[th] = _build_decode_table(bits, vals)
                i += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            ncomp = seg[0]
            for c in range(ncomp):
                cid, tabs = seg[1 + 2 * c: 3 + 2 * c]
                for comp in comps:
                    if comp["id"] == cid:
                        comp["td"], comp["ta"] = tabs >> 4, tabs & 0x0F
            pos += seglen
            return _decode_scan(
                data, pos, width, height, comps, qt, huff_dc, huff_ac,
                restart_interval,
            )
        pos += seglen
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, width, height, comps, qt, huff_dc, huff_ac, dri):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (width + mcu_w - 1) // mcu_w
    mcus_y = (height + mcu_h - 1) // mcu_h
    # per-component plane at its own resolution
    for c in comps:
        c["pw"] = mcus_x * c["h"] * 8
        c["ph"] = mcus_y * c["v"] * 8
        c["plane"] = bytearray(c["pw"] * c["ph"])
        c["pred"] = 0
    r = _BitReader(data, pos)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu_count and mcu_count % dri == 0:
                r.align()
                # skip the RSTn marker
                while data[r.pos] != 0xFF or not (0xD0 <= data[r.pos + 1] <= 0xD7):
                    r.pos += 1
                r.pos += 2
                for c in comps:
                    c["pred"] = 0
            for c in comps:
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeffs = [0.0] * 64
                        t = r.huff(huff_dc[c["td"]])
                        diff = _extend(r.bits(t), t) if t else 0
                        c["pred"] += diff
                        coeffs[0] = c["pred"] * q[0]
                        k = 1
                        while k < 64:
                            rs = r.huff(huff_ac[c["ta"]])
                            rr, ss = rs >> 4, rs & 0x0F
                            if ss == 0:
                                if rr == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += rr
                            coeffs[ZIGZAG[k]] = _extend(r.bits(ss), ss) * q[k]
                            k += 1
                        px = _idct_2d(coeffs)
                        ox = (mx * c["h"] + bx) * 8
                        oy = (my * c["v"] + by) * 8
                        plane, pw = c["plane"], c["pw"]
                        for y in range(8):
                            row = (oy + y) * pw + ox
                            for x in range(8):
                                v = int(round(px[y * 8 + x])) + 128
                                plane[row + x] = 0 if v < 0 else (255 if v > 255 else v)
            mcu_count += 1
    if len(comps) == 1:
        c = comps[0]
        out = bytearray(width * height)
        for y in range(height):
            out[y * width: (y + 1) * width] = c["plane"][y * c["pw"]: y * c["pw"] + width]
        return width, height, 1, bytes(out)
    # upsample (nearest) + YCbCr -> RGB (BT.601)
    cy, cb, cr = comps[0], comps[1], comps[2]
    out = bytearray(width * height * 3)
    for y in range(height):
        yy = cy["plane"][y * cy["pw"]:]
        by = cb["plane"][(y * cb["v"] // vmax) * cb["pw"]:]
        ry = cr["plane"][(y * cr["v"] // vmax) * cr["pw"]:]
        o = y * width * 3
        for x in range(width):
            Y = yy[x * cy["h"] // hmax]
            B = by[x * cb["h"] // hmax] - 128
            R = ry[x * cr["h"] // hmax] - 128
            r_ = Y + 1.402 * R
            g_ = Y - 0.344136 * B - 0.714136 * R
            b_ = Y + 1.772 * B
            out[o] = 0 if r_ < 0 else (255 if r_ > 255 else int(r_ + 0.5))
            out[o + 1] = 0 if g_ < 0 else (255 if g_ > 255 else int(g_ + 0.5))
            out[o + 2] = 0 if b_ < 0 else (255 if b_ > 255 else int(b_ + 0.5))
            o += 3
    return width, height, 3, bytes(out)


# ------------------------------------------------------------------ encoder

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            self.write(0x7F, 8 - self.n)  # pad with 1s


def _quality_scale(q: list[int], quality: int) -> list[int]:
    """IJG quality scaling (1..100)."""
    quality = max(1, min(100, quality))
    s = 5000 // quality if quality < 50 else 200 - quality * 2
    return [max(1, min(255, (v * s + 50) // 100)) for v in q]


def _mag(v: int) -> tuple[int, int]:
    """(category, magnitude bits) for a signed value (T.81 F.1.2)."""
    a = abs(v)
    t = a.bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


def _encode_block(w: _BitWriter, block: list[float], q: list[int],
                  dc_tab: dict, ac_tab: dict, pred: int) -> int:
    co = _fdct_2d(block)
    zz = [int(round(co[ZIGZAG[i]] / q[i])) for i in range(64)]
    t, m = _mag(zz[0] - pred)
    ln, code = dc_tab[t]
    w.write(code, ln)
    if t:
        w.write(m, t)
    run = 0
    for k in range(1, 64):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_tab[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        t, m = _mag(zz[k])
        ln, code = ac_tab[(run << 4) | t]
        w.write(code, ln)
        w.write(m, t)
        run = 0
    if run:
        ln, code = ac_tab[0x00]  # EOB
        w.write(code, ln)
    return zz[0]


def encode_jpeg(width: int, height: int, pixels: bytes, channels: int = 3,
                quality: int = 90, subsample: bool = False) -> bytes:
    """Baseline JPEG from top-down row-major RGB (channels=3) or grayscale
    (channels=1) bytes; 4:2:0 chroma when subsample=True."""
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    qlum = _quality_scale(QT_LUM, quality)
    qchr = _quality_scale(QT_CHROM, quality)

    # color conversion into per-component planes (float, level-shifted later)
    if channels == 3:
        n = width * height
        Y = [0.0] * n
        Cb = [0.0] * n
        Cr = [0.0] * n
        for i in range(n):
            r, g, b = pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2]
            Y[i] = 0.299 * r + 0.587 * g + 0.114 * b
            Cb[i] = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
            Cr[i] = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        if subsample:
            cw, ch_ = (width + 1) // 2, (height + 1) // 2
            sub_cb = [0.0] * (cw * ch_)
            sub_cr = [0.0] * (cw * ch_)
            for yy in range(ch_):
                for xx in range(cw):
                    acc_b = acc_r = 0.0
                    cnt = 0
                    for dy in (0, 1):
                        for dx in (0, 1):
                            sx, sy = 2 * xx + dx, 2 * yy + dy
                            if sx < width and sy < height:
                                acc_b += Cb[sy * width + sx]
                                acc_r += Cr[sy * width + sx]
                                cnt += 1
                    sub_cb[yy * cw + xx] = acc_b / cnt
                    sub_cr[yy * cw + xx] = acc_r / cnt
            planes = [(Y, width, height, 2, 2, qlum), (sub_cb, cw, ch_, 1, 1, qchr),
                      (sub_cr, cw, ch_, 1, 1, qchr)]
        else:
            planes = [(Y, width, height, 1, 1, qlum), (Cb, width, height, 1, 1, qchr),
                      (Cr, width, height, 1, 1, qchr)]
    else:
        planes = [([float(p) for p in pixels], width, height, 1, 1, qlum)]

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, payload: bytes) -> None:
        out.extend(b"\xff" + bytes([marker]) + struct.pack(">H", len(payload) + 2) + payload)

    seg(0xDB, bytes([0]) + bytes(qlum))
    if channels == 3:
        seg(0xDB, bytes([1]) + bytes(qchr))
    # SOF0
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([len(planes)])
    for ci, (_, _, _, h, v, _) in enumerate(planes):
        sof += bytes([ci + 1, (h << 4) | v, 0 if ci == 0 else 1])
    seg(0xC0, sof)
    # DHT (Annex K tables)
    for tc, th, (bits, vals) in ((0, 0, HT_DC_LUM), (1, 0, HT_AC_LUM),
                                 (0, 1, HT_DC_CHROM), (1, 1, HT_AC_CHROM)):
        if channels == 1 and th == 1:
            continue
        seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    # SOS
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    enc_dc = [_build_encode_table(*HT_DC_LUM), _build_encode_table(*HT_DC_CHROM)]
    enc_ac = [_build_encode_table(*HT_AC_LUM), _build_encode_table(*HT_AC_CHROM)]
    hmax = max(p[3] for p in planes)
    vmax = max(p[4] for p in planes)
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
    w = _BitWriter()
    preds = [0] * len(planes)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (plane, pw, ph, h, v, q) in enumerate(planes):
                ti = 0 if ci == 0 else 1
                for by in range(v):
                    for bx in range(h):
                        block = [0.0] * 64
                        ox, oy = (mx * h + bx) * 8, (my * v + by) * 8
                        for y in range(8):
                            sy = min(oy + y, ph - 1)
                            for x in range(8):
                                sx = min(ox + x, pw - 1)
                                block[y * 8 + x] = plane[sy * pw + sx] - 128.0
                        preds[ci] = _encode_block(
                            w, block, q, enc_dc[ti], enc_ac[ti], preds[ci]
                        )
    w.flush()
    out.extend(w.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)
