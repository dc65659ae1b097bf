"""Pure-stdlib lossless WebP (VP8L) codec — encoder + decoder.

Closes the last env-blocked codec in the multimodal tier (r6 shipped
PNG/BMP in ``codecs.py``, r7 added baseline JPEG in ``jpeg.py`` and
RIFF/WAVE + AVI/MJPEG in ``audio.py``/``avi.py``; WebP was the remaining
loud ``NotImplementedError``). Implements the public VP8L bitstream spec
(RFC 9649 / "WebP Lossless Bitstream Specification") from scratch:

- RIFF/WEBP container with a VP8L chunk
- LSB-first bit packing; canonical prefix codes written/read MSB-of-code
  first (the DEFLATE convention VP8L shares)
- the full prefix-code metadata machinery: simple codes (1-2 symbols) and
  normal codes (code-length-code over the 19-symbol alphabet in
  ``_CL_ORDER``, zero-run codes 17/18, repeat code 16)
- literal pixels (G, R, B, A trees), LZ77 backward references (length +
  linear distance prefix values), and the hash-indexed color cache
- encoder: single prefix-code group, optional color cache + distance-1 run
  LZ77 + ALL FOUR spec transforms — SUBTRACT_GREEN, PREDICTOR
  (per-16x16-block mode selection), COLOR (per-block channel correlation
  multipliers), and PALETTE (color indexing incl. the sub-byte index
  bundling for <= 16 colors), each meta-image/palette entropy-coded as a
  sub-stream; decoder additionally handles arbitrary linear distances,
  any cache size, any block size, and all 14 spec predictor modes

Honest scope guards (raise, never silently wrong): meta prefix codes,
the 120-entry 2D distance map (an encoder-side near-distance
optimization; this encoder always writes linear distance codes, which any
spec decoder accepts), palette combined with other transforms, and lossy
VP8/VP8X. No third-party decoder exists in this container to
cross-check against, so compliance is pinned by exhaustive round-trips +
structural bit-layout tests (tests/test_webp.py) the same way jpeg.py is.

Reference parity note: SkinnerDB has no media codecs at all — this is the
extension tier's multimodal plumbing (SURVEY §2.10), where the 100 TB
pipeline story needs real decode over Arrow batches, not a stub.
"""

from __future__ import annotations

import struct

# order in which code-length-code lengths are stored (VP8L spec §5.2.2)
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
_CACHE_MUL = 0x1E35A7BD
_MAX_LZ77 = 4096


# ---------------------------------------------------------------------------
# bit I/O — LSB-first stream; prefix codes MSB-of-code first
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self._buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        self._acc |= (value & ((1 << nbits) - 1)) << self._n
        self._n += nbits
        while self._n >= 8:
            self._buf.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def write_code(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        out = bytearray(self._buf)
        if self._n:
            out.append(self._acc & 0xFF)
        return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self._d = data
        self._pos = 0  # bit position

    def read(self, nbits: int) -> int:
        v = 0
        for i in range(nbits):
            byte = self._d[self._pos >> 3]
            v |= ((byte >> (self._pos & 7)) & 1) << i
            self._pos += 1
        return v


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------

def _huffman_lengths(freqs: dict[int, int], max_len: int) -> dict[int, int]:
    """Code length per symbol (heap Huffman; halve-and-retry on overflow)."""
    import heapq
    import itertools

    if not freqs:
        return {}
    if len(freqs) == 1:
        return {next(iter(freqs)): 1}
    f = dict(freqs)
    while True:
        tie = itertools.count()
        heap = [(w, next(tie), {s: 0}) for s, w in sorted(f.items())]
        heapq.heapify(heap)
        while len(heap) > 1:
            wa, _, da = heapq.heappop(heap)
            wb, _, db = heapq.heappop(heap)
            merged = {s: d + 1 for s, d in da.items()}
            merged.update({s: d + 1 for s, d in db.items()})
            heapq.heappush(heap, (wa + wb, next(tie), merged))
        lengths = heap[0][2]
        if max(lengths.values()) <= max_len:
            return lengths
        f = {s: (w + 1) // 2 for s, w in f.items()}


def _canonical_codes(lengths: dict[int, int]) -> dict[int, int]:
    """RFC1951 canonical assignment: by (length, symbol)."""
    codes: dict[int, int] = {}
    code = 0
    prev_len = 0
    for sym in sorted(lengths, key=lambda s: (lengths[s], s)):
        code <<= lengths[sym] - prev_len
        codes[sym] = code
        prev_len = lengths[sym]
        code += 1
    return codes


class _Decoder:
    """Prefix-code reader: walk bit by bit against the canonical table."""

    def __init__(self, lengths: dict[int, int]) -> None:
        nz = {s: l for s, l in lengths.items() if l > 0}
        if len(nz) == 0:
            raise ValueError("empty prefix code")
        self.single = next(iter(nz)) if len(nz) == 1 else None
        codes = _canonical_codes(nz)
        self.table = {(nz[s], c): s for s, c in codes.items()}
        self.max_len = max(nz.values())

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, self.max_len + 1):
            code = (code << 1) | br.read(1)
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid prefix code in VP8L stream")


# ---------------------------------------------------------------------------
# LZ77 prefix values (length codes 0-23, distance codes 0-39)
# ---------------------------------------------------------------------------

def _lz77_read(code: int, br: _BitReader) -> int:
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _lz77_sym(value: int, n_codes: int) -> tuple[int, int, int]:
    """(code, extra_bits_value, extra_bits_count) for a prefix value."""
    if value <= 4:
        return value - 1, 0, 0
    for code in range(4, n_codes):
        extra = (code - 2) >> 1
        offset = (2 + (code & 1)) << extra
        if offset + 1 <= value <= offset + (1 << extra):
            return code, value - offset - 1, extra
    raise ValueError(f"LZ77 value {value} out of range")


# ---------------------------------------------------------------------------
# prefix-code (de)serialization
# ---------------------------------------------------------------------------

def _read_prefix_code(br: _BitReader, alphabet: int) -> _Decoder:
    if br.read(1):  # simple code
        num = br.read(1) + 1
        sym0 = br.read(8) if br.read(1) else br.read(1)
        if num == 1:
            return _SingleDecoder(sym0)
        sym1 = br.read(8)
        return _Decoder({sym0: 1, sym1: 1})
    # normal code: code-length-code first
    num_cl = 4 + br.read(4)
    cl_lengths = {}
    for i in range(num_cl):
        bits = br.read(3)
        if bits:
            cl_lengths[_CL_ORDER[i]] = bits
    cl_dec = _Decoder(cl_lengths)
    if br.read(1):  # use length / max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet
    lengths: dict[int, int] = {}
    symbol = 0
    prev = 8
    while symbol < alphabet and max_symbol > 0:
        max_symbol -= 1
        s = cl_dec.read(br)
        if s < 16:
            if s:
                lengths[symbol] = s
                prev = s
            symbol += 1
        elif s == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                lengths[symbol] = prev
                symbol += 1
        elif s == 17:
            symbol += 3 + br.read(3)
        else:  # 18
            symbol += 11 + br.read(7)
    return _Decoder(lengths)


class _SingleDecoder:
    """Simple code with one symbol: decodes with zero bits consumed."""

    def __init__(self, sym: int) -> None:
        self.single = sym

    def read(self, br: _BitReader) -> int:  # noqa: ARG002 - signature parity
        return self.single


class _Encoder:
    """One prefix code on the wire + per-symbol emit."""

    def __init__(self, freqs: dict[int, int], alphabet: int) -> None:
        self.freqs = dict(freqs) or {0: 1}
        self.alphabet = alphabet

    def write_def(self, bw: _BitWriter) -> None:
        syms = sorted(self.freqs)
        if len(syms) == 1 and syms[0] < 256:
            bw.write(1, 1)  # simple
            bw.write(0, 1)  # one symbol
            self._write_first(bw, syms[0])
            self.lengths = {syms[0]: 0}
            self.codes = {syms[0]: 0}
            return
        if len(syms) == 2 and all(s < 256 for s in syms):
            bw.write(1, 1)
            bw.write(1, 1)  # two symbols
            self._write_first(bw, syms[0])
            bw.write(syms[1], 8)
            self.lengths = {syms[0]: 1, syms[1]: 1}
            self.codes = _canonical_codes(self.lengths)
            return
        # normal code; a single >=256 symbol gets a 1-bit padding partner
        freqs = dict(self.freqs)
        if len(freqs) == 1:
            freqs[0] = 1
        self.lengths = _huffman_lengths(freqs, 15)
        self.codes = _canonical_codes(self.lengths)
        bw.write(0, 1)
        self._write_normal(bw)

    @staticmethod
    def _write_first(bw: _BitWriter, sym: int) -> None:
        if sym > 1:
            bw.write(1, 1)
            bw.write(sym, 8)
        else:
            bw.write(0, 1)
            bw.write(sym, 1)

    def _write_normal(self, bw: _BitWriter) -> None:
        # the reader consumes code lengths for the ENTIRE alphabet (no
        # max_symbol shortcut is written), so trailing zeros are emitted
        # as explicit zero-run tokens
        dense = [self.lengths.get(i, 0) for i in range(self.alphabet)]
        # tokenize: literals 0-15, zero-runs 17 (3-10) / 18 (11-138)
        tokens: list[tuple[int, int, int]] = []  # (symbol, extra, extra_bits)
        i = 0
        while i < len(dense):
            if dense[i] == 0:
                run = 1
                while i + run < len(dense) and dense[i + run] == 0:
                    run += 1
                i += run
                while run:
                    if run >= 11:
                        take = min(run, 138)
                        tokens.append((18, take - 11, 7))
                    elif run >= 3:
                        take = run
                        tokens.append((17, take - 3, 3))
                    else:
                        take = 1
                        tokens.append((0, 0, 0))
                    run -= take
            else:
                tokens.append((dense[i], 0, 0))
                i += 1
        cl_freqs: dict[int, int] = {}
        for s, _, _ in tokens:
            cl_freqs[s] = cl_freqs.get(s, 0) + 1
        cl_lengths = _huffman_lengths(cl_freqs, 7)
        if len(cl_lengths) == 1:  # a 0-bit CL code cannot be signalled
            pad = next(s for s in range(19) if s not in cl_lengths)
            cl_lengths = {next(iter(cl_lengths)): 1, pad: 1}
        cl_codes = _canonical_codes(cl_lengths)
        num_cl = max(i for i, s in enumerate(_CL_ORDER) if s in cl_lengths) + 1
        num_cl = max(num_cl, 4)
        bw.write(num_cl - 4, 4)
        for i in range(num_cl):
            bw.write(cl_lengths.get(_CL_ORDER[i], 0), 3)
        bw.write(0, 1)  # no max_symbol shortcut
        for s, extra, ebits in tokens:
            bw.write_code(cl_codes[s], cl_lengths[s])
            if ebits:
                bw.write(extra, ebits)

    def emit(self, bw: _BitWriter, sym: int) -> None:
        if self.lengths[sym]:
            bw.write_code(self.codes[sym], self.lengths[sym])


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

#: VP8L transform type codes (spec §3)
_T_PREDICTOR, _T_COLOR, _T_SUBTRACT_GREEN, _T_PALETTE = 0, 1, 2, 3


def _encode_image_stream(bw: _BitWriter, argb: list[int], cache_bits: int,
                         use_lz77: bool, top_level: bool) -> None:
    """Entropy-coded image substream: color-cache info, (main image only)
    the meta-prefix-codes bit, the 5 prefix code definitions, and the pixel
    token stream. Used for the main image AND for transform meta-images
    (which are entropy images without the meta bit)."""
    cache_size = (1 << cache_bits) if cache_bits else 0
    shift = 32 - cache_bits if cache_bits else 0

    # tokenize: ('lit', px) / ('cache', idx) / ('copy', length) — dist is
    # always 1 (runs), written as the linear distance code 1+120
    def tokenize() -> list[tuple[str, int]]:
        cache = [None] * cache_size
        toks: list[tuple[str, int]] = []
        n = len(argb)
        i = 0
        while i < n:
            px = argb[i]
            if use_lz77 and i > 0 and px == argb[i - 1]:
                run = 1
                while (i + run < n and argb[i + run] == px
                       and run < _MAX_LZ77):
                    run += 1
                if run >= 3:
                    toks.append(("copy", run))
                    if cache_size:
                        for j in range(i, i + run):
                            cache[(_CACHE_MUL * argb[j] & 0xFFFFFFFF) >> shift] = argb[j]
                    i += run
                    continue
            if cache_size:
                idx = (_CACHE_MUL * px & 0xFFFFFFFF) >> shift
                if cache[idx] == px:
                    toks.append(("cache", idx))
                else:
                    cache[idx] = px
                    toks.append(("lit", px))
            else:
                toks.append(("lit", px))
            i += 1
        return toks

    toks = tokenize()
    gf: dict[int, int] = {}
    rf: dict[int, int] = {}
    bf: dict[int, int] = {}
    af: dict[int, int] = {}
    df: dict[int, int] = {}

    def bump(d: dict[int, int], k: int) -> None:
        d[k] = d.get(k, 0) + 1

    for kind, v in toks:
        if kind == "lit":
            bump(gf, (v >> 8) & 0xFF)
            bump(rf, (v >> 16) & 0xFF)
            bump(bf, v & 0xFF)
            bump(af, (v >> 24) & 0xFF)
        elif kind == "cache":
            bump(gf, 280 + v)
        else:
            code, _, _ = _lz77_sym(v, 24)
            bump(gf, 256 + code)
            dcode, _, _ = _lz77_sym(1 + 120, 40)
            bump(df, dcode)

    g_enc = _Encoder(gf, 256 + 24 + cache_size)
    r_enc, b_enc, a_enc = (_Encoder(f, 256) for f in (rf, bf, af))
    d_enc = _Encoder(df, 40)

    if cache_size:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if top_level:
        bw.write(0, 1)  # no meta prefix codes
    for enc in (g_enc, r_enc, b_enc, a_enc, d_enc):
        enc.write_def(bw)
    for kind, v in toks:
        if kind == "lit":
            g_enc.emit(bw, (v >> 8) & 0xFF)
            r_enc.emit(bw, (v >> 16) & 0xFF)
            b_enc.emit(bw, v & 0xFF)
            a_enc.emit(bw, (v >> 24) & 0xFF)
        elif kind == "cache":
            g_enc.emit(bw, 280 + v)
        else:
            code, extra, ebits = _lz77_sym(v, 24)
            g_enc.emit(bw, 256 + code)
            if ebits:
                bw.write(extra, ebits)
            dcode, dextra, debits = _lz77_sym(121, 40)
            d_enc.emit(bw, dcode)
            if debits:
                bw.write(dextra, debits)


# ---------------------------------------------------------------------------
# the PREDICTOR transform (type 0): per-block spatial prediction modes in a
# subsampled meta-image, residuals entropy-coded as the main image
# ---------------------------------------------------------------------------

def _unpack(px: int) -> tuple[int, int, int, int]:
    return (px >> 24) & 0xFF, (px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF


def _pack(a: int, r: int, g: int, b: int) -> int:
    return (a << 24) | (r << 16) | (g << 8) | b


def _avg2(x: int, y: int) -> int:
    return _pack(*[(p + q) >> 1 for p, q in zip(_unpack(x), _unpack(y))])


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _predict(mode: int, left: int, top: int, tl: int, tr: int) -> int:
    """The 14 spec predictors. Neighbor addressing is LINEAR-ARRAY (spec):
    for the rightmost column, 'top-right' wraps to the first pixel of the
    current row (index i - width + 1), which is already reconstructed."""
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(left, tr), top)
    if mode == 6:
        return _avg2(left, tl)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(tl, top)
    if mode == 9:
        return _avg2(top, tr)
    if mode == 10:
        return _avg2(_avg2(left, tl), _avg2(top, tr))
    if mode == 11:  # Select
        l4, t4, tl4 = _unpack(left), _unpack(top), _unpack(tl)
        p = [lc + tc - tlc for lc, tc, tlc in zip(l4, t4, tl4)]
        p_l = sum(abs(pc - lc) for pc, lc in zip(p, l4))
        p_t = sum(abs(pc - tc) for pc, tc in zip(p, t4))
        return left if p_l <= p_t else top
    if mode == 12:  # ClampAddSubtractFull
        return _pack(*[
            _clamp(lc + tc - tlc)
            for lc, tc, tlc in zip(_unpack(left), _unpack(top), _unpack(tl))
        ])
    if mode == 13:  # ClampAddSubtractHalf
        out = []
        for lc, tc, tlc in zip(_unpack(left), _unpack(top), _unpack(tl)):
            ave = (lc + tc) >> 1
            out.append(_clamp(ave + ((ave - tlc) >> 1)))
        return _pack(*out)
    raise ValueError(f"predictor mode {mode} out of range")


def _predicted_at(i: int, w: int, data: list[int], modes: list[int],
                  meta_w: int, block_bits: int) -> int:
    """Prediction for linear pixel i given already-known pixels data[:i]."""
    x, y = i % w, i // w
    if i == 0:
        return 0xFF000000
    if y == 0:
        return data[i - 1]           # top row: forced L
    if x == 0:
        return data[i - w]           # left column: forced T
    mode = modes[(y >> block_bits) * meta_w + (x >> block_bits)]
    left = data[i - 1]
    top = data[i - w]
    tl = data[i - w - 1]
    tr = data[i - w + 1]  # wraps to row start for the last column (spec)
    return _predict(mode, left, top, tl, tr)


def _residual(px: int, pred: int) -> int:
    return _pack(*[(p - q) & 0xFF for p, q in zip(_unpack(px), _unpack(pred))])


def _apply_inverse_predictor(pixels: list[int], w: int, modes: list[int],
                             meta_w: int, block_bits: int) -> list[int]:
    out: list[int] = []
    for i, res in enumerate(pixels):
        pred = _predicted_at(i, w, out, modes, meta_w, block_bits)
        out.append(_pack(*[
            (rc + pc) & 0xFF for rc, pc in zip(_unpack(res), _unpack(pred))
        ]))
    return out


#: encoder block size 2^4 = 16; modes evaluated per block (cheap subset —
#: the decoder supports all 14)
_ENC_BLOCK_BITS = 4
_ENC_MODES = (0, 1, 2, 7)


# ---------------------------------------------------------------------------
# the COLOR transform (type 1): per-block signed 3.5-fixed-point channel
# correlation multipliers (green->red, green->blue, red->blue) in a meta
# image; same block/meta machinery as PREDICTOR
# ---------------------------------------------------------------------------

def _int8(v: int) -> int:
    """Byte -> signed int8 (the spec interprets channel/multiplier bytes
    as two's-complement for the color-transform delta)."""
    return v - 256 if v >= 128 else v


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: (int8 multiplier * int8 channel) >> 5."""
    return (_int8(t) * _int8(c)) >> 5


def _color_forward(px: int, g2r: int, g2b: int, r2b: int) -> int:
    a, r, g, b = _unpack(px)
    new_r = (r - _ct_delta(g2r, g)) & 0xFF
    # the decoder restores red BEFORE blue, so blue's red-delta uses the
    # ORIGINAL red value
    new_b = (b - _ct_delta(g2b, g) - _ct_delta(r2b, r)) & 0xFF
    return _pack(a, new_r, g, new_b)


def _color_inverse(px: int, g2r: int, g2b: int, r2b: int) -> int:
    a, r, g, b = _unpack(px)
    red = (r + _ct_delta(g2r, g)) & 0xFF
    blue = (b + _ct_delta(g2b, g) + _ct_delta(r2b, red)) & 0xFF
    return _pack(a, red, g, blue)


#: encoder multiplier candidates (small search; decoder accepts any byte)
_CT_CANDIDATES = (0, 16, 32, 64, 128 + 64, 128 + 96, 128 + 112)  # 0, +, and - values


def _build_color_plan(argb: list[int], w: int, h: int,
                      ) -> tuple[list[int], list[int], int, int]:
    """(transformed pixels, meta pixels, meta_w, block_bits): per block,
    greedily pick g2r/g2b/r2b from the candidate set minimizing wrap-aware
    residual magnitude of the transformed red/blue channels."""
    bb = _ENC_BLOCK_BITS
    meta_w = (w + (1 << bb) - 1) >> bb
    meta_h = (h + (1 << bb) - 1) >> bb
    out = list(argb)
    meta: list[int] = []
    for by in range(meta_h):
        for bx in range(meta_w):
            idxs = [
                y * w + x
                for y in range(by << bb, min((by + 1) << bb, h))
                for x in range(bx << bb, min((bx + 1) << bb, w))
            ]

            def cost(chan_vals: list[int]) -> int:
                return sum(min(v, 256 - v) for v in chan_vals)

            def red_after(t: int) -> list[int]:
                return [
                    ((_unpack(argb[i])[1] - _ct_delta(t, _unpack(argb[i])[2]))
                     & 0xFF)
                    for i in idxs
                ]

            g2r = min(_CT_CANDIDATES, key=lambda t: cost(red_after(t)))

            def blue_after(g2b: int, r2b: int) -> list[int]:
                vals = []
                for i in idxs:
                    _, r, g, b = _unpack(argb[i])
                    vals.append(
                        (b - _ct_delta(g2b, g) - _ct_delta(r2b, r)) & 0xFF)
                return vals

            g2b = min(_CT_CANDIDATES, key=lambda t: cost(blue_after(t, 0)))
            r2b = min(_CT_CANDIDATES, key=lambda t: cost(blue_after(g2b, t)))
            for i in idxs:
                out[i] = _color_forward(argb[i], g2r, g2b, r2b)
            # spec byte layout: g2r rides the BLUE byte, g2b the GREEN
            # byte, r2b the RED byte of the meta pixel
            meta.append(_pack(0xFF, r2b, g2b, g2r))
    return out, meta, meta_w, bb


def _apply_inverse_color(pixels: list[int], w: int, meta: list[int],
                         meta_w: int, block_bits: int) -> list[int]:
    out = []
    for i, px in enumerate(pixels):
        x, y = i % w, i // w
        m = meta[(y >> block_bits) * meta_w + (x >> block_bits)]
        _, r2b, g2b, g2r = _unpack(m)
        out.append(_color_inverse(px, g2r, g2b, r2b))
    return out


def _build_predictor_plan(argb: list[int], w: int, h: int,
                          ) -> tuple[list[int], list[int], int, int]:
    """(residuals, block modes, meta_w, block_bits): per block, pick the
    _ENC_MODES member with the smallest sum-abs residual."""
    bb = _ENC_BLOCK_BITS
    meta_w = (w + (1 << bb) - 1) >> bb
    meta_h = (h + (1 << bb) - 1) >> bb
    modes = [0] * (meta_w * meta_h)
    for by in range(meta_h):
        for bx in range(meta_w):
            best, best_cost = 0, None
            for mode in _ENC_MODES:
                trial = [mode] * (meta_w * meta_h)
                cost = 0
                for y in range(by << bb, min((by + 1) << bb, h)):
                    for x in range(bx << bb, min((bx + 1) << bb, w)):
                        i = y * w + x
                        pred = _predicted_at(i, w, argb, trial, meta_w, bb)
                        cost += sum(
                            min(d, 256 - d)
                            for d in _unpack(_residual(argb[i], pred))
                        )
                if best_cost is None or cost < best_cost:
                    best, best_cost = mode, cost
            modes[by * meta_w + bx] = best
    full = [
        _residual(px, _predicted_at(i, w, argb, modes, meta_w, bb))
        for i, px in enumerate(argb)
    ]
    return full, modes, meta_w, bb


# ---------------------------------------------------------------------------
# the PALETTE / color-indexing transform (type 3): distinct colors in a
# delta-coded 1-row sub-image; pixels become indices riding the GREEN
# channel, sub-byte-BUNDLED for palettes of <= 16 colors (8/4/2 indices
# per coded pixel), which also shrinks the coded image width
# ---------------------------------------------------------------------------

def _palette_width_bits(size: int) -> int:
    if size <= 2:
        return 3  # 8 indices per coded pixel (1 bit each)
    if size <= 4:
        return 2  # 4 per pixel (2 bits)
    if size <= 16:
        return 1  # 2 per pixel (4 bits)
    return 0


def _build_palette_plan(argb: list[int], w: int, h: int,
                        ) -> tuple[list[int], list[int], int]:
    """(packed coded pixels, delta-coded palette image, width_bits)."""
    palette: list[int] = []
    index: dict[int, int] = {}
    for px in argb:
        if px not in index:
            index[px] = len(palette)
            palette.append(px)
    if len(palette) > 256:
        raise ValueError(
            f"palette transform needs <= 256 distinct colors, got {len(palette)}")
    wb = _palette_width_bits(len(palette))
    ppb = 1 << wb          # indices per coded pixel
    bits_per_idx = 8 >> wb
    packed_w = (w + ppb - 1) >> wb
    packed: list[int] = []
    for y in range(h):
        for px_x in range(packed_w):
            acc = 0
            for k in range(ppb):
                x = (px_x << wb) + k
                if x < w:
                    acc |= index[argb[y * w + x]] << (k * bits_per_idx)
            packed.append(0xFF000000 | (acc << 8))
    # delta-code the palette component-wise vs the previous entry (prev=0)
    deltas: list[int] = []
    prev = 0
    for px in palette:
        deltas.append(_pack(*[
            (c - p) & 0xFF for c, p in zip(_unpack(px), _unpack(prev))
        ]))
        prev = px
    return packed, deltas, wb


def _apply_inverse_palette(pixels: list[int], w: int, h: int,
                           palette: list[int], wb: int) -> list[int]:
    ppb = 1 << wb
    bits_per_idx = 8 >> wb
    mask = (1 << bits_per_idx) - 1
    packed_w = (w + ppb - 1) >> wb
    out: list[int] = []
    for y in range(h):
        for x in range(w):
            coded = pixels[y * packed_w + (x >> wb)]
            idx = ((coded >> 8) >> ((x & (ppb - 1)) * bits_per_idx)) & mask
            if idx >= len(palette):
                raise ValueError("palette index out of range")
            out.append(palette[idx])
    return out


def encode_webp(width: int, height: int, pixels: bytes, channels: int = 3,
                cache_bits: int = 6, use_lz77: bool = True,
                subtract_green: bool = False, predictor: bool = False,
                color_transform: bool = False, palette: bool = False) -> bytes:
    """Encode interleaved RGB/RGBA rows as a lossless VP8L WebP.

    ``subtract_green`` applies the spec's SUBTRACT_GREEN transform (r -= g,
    b -= g mod 256) before entropy coding; ``predictor`` applies the
    PREDICTOR transform (per-16x16-block spatial prediction, residuals
    coded); ``color_transform`` applies the COLOR transform (per-block
    channel-correlation multipliers); ``palette`` applies the color-
    indexing transform (<= 256 distinct colors, sub-byte index bundling
    for <= 16). One transform at a time here, to keep the inverse order
    unambiguous."""
    if channels not in (3, 4):
        raise ValueError("channels must be 3 (RGB) or 4 (RGBA)")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")
    if subtract_green + predictor + color_transform + palette > 1:
        raise ValueError(
            "subtract_green / predictor / color_transform / palette are "
            "mutually exclusive in this encoder")
    argb = []
    for i in range(width * height):
        o = i * channels
        a = pixels[o + 3] if channels == 4 else 255
        r, g, b = pixels[o], pixels[o + 1], pixels[o + 2]
        if subtract_green:
            r = (r - g) & 0xFF
            b = (b - g) & 0xFF
        argb.append((a << 24) | (r << 16) | (g << 8) | b)

    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(1 if channels == 4 else 0, 1)  # alpha hint
    bw.write(0, 3)  # version
    if subtract_green:
        bw.write(1, 1)  # a transform follows
        bw.write(_T_SUBTRACT_GREEN, 2)  # no payload for this transform
    if predictor:
        argb, modes, meta_w, bb = _build_predictor_plan(argb, width, height)
        bw.write(1, 1)
        bw.write(_T_PREDICTOR, 2)
        bw.write(bb - 2, 3)  # block size exponent - 2
        meta = [_pack(0xFF, 0, m, 0) for m in modes]  # mode rides GREEN
        _encode_image_stream(bw, meta, cache_bits=0, use_lz77=use_lz77,
                             top_level=False)
    if color_transform:
        argb, meta, meta_w, bb = _build_color_plan(argb, width, height)
        bw.write(1, 1)
        bw.write(_T_COLOR, 2)
        bw.write(bb - 2, 3)
        _encode_image_stream(bw, meta, cache_bits=0, use_lz77=use_lz77,
                             top_level=False)
    if palette:
        argb, deltas, _wb = _build_palette_plan(argb, width, height)
        bw.write(1, 1)
        bw.write(_T_PALETTE, 2)
        bw.write(len(deltas) - 1, 8)
        _encode_image_stream(bw, deltas, cache_bits=0, use_lz77=use_lz77,
                             top_level=False)
    bw.write(0, 1)  # end of transforms
    _encode_image_stream(bw, argb, cache_bits, use_lz77, top_level=True)

    payload = bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def _decode_image_stream(br: _BitReader, n: int, top_level: bool) -> list[int]:
    """Entropy-coded image substream -> n ARGB ints (mirror of
    :func:`_encode_image_stream`)."""
    cache_bits = br.read(4) if br.read(1) else 0
    cache_size = (1 << cache_bits) if cache_bits else 0
    shift = 32 - cache_bits if cache_bits else 0
    if top_level and br.read(1):
        raise NotImplementedError("meta prefix codes not supported")

    g_dec = _read_prefix_code(br, 256 + 24 + cache_size)
    r_dec = _read_prefix_code(br, 256)
    b_dec = _read_prefix_code(br, 256)
    a_dec = _read_prefix_code(br, 256)
    d_dec = _read_prefix_code(br, 40)

    pixels: list[int] = []
    cache = [None] * cache_size

    def insert(px: int) -> None:
        if cache_size:
            cache[(_CACHE_MUL * px & 0xFFFFFFFF) >> shift] = px

    while len(pixels) < n:
        g = g_dec.read(br)
        if g < 256:
            r = r_dec.read(br)
            b = b_dec.read(br)
            a = a_dec.read(br)
            px = (a << 24) | (r << 16) | (g << 8) | b
            pixels.append(px)
            insert(px)
        elif g < 280:
            length = _lz77_read(g - 256, br)
            dcode = _lz77_read(d_dec.read(br), br)
            if dcode <= 120:
                raise NotImplementedError(
                    "2D distance-map codes not supported (linear only)")
            dist = dcode - 120
            if dist > len(pixels):
                raise ValueError("backward reference before stream start")
            for _ in range(length):
                px = pixels[-dist]
                pixels.append(px)
                insert(px)
        else:
            idx = g - 280
            if idx >= cache_size or cache[idx] is None:
                raise ValueError("color cache miss on read")
            pixels.append(cache[idx])
    return pixels


def decode_webp(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a lossless WebP -> (width, height, channels, pixel bytes).

    channels is 4 (RGBA) when any alpha sample != 255, else 3 (RGB)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP container")
    pos = 12
    payload = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        if tag == b"VP8L":
            payload = data[pos + 8:pos + 8 + size]
            break
        if tag in (b"VP8 ", b"VP8X"):
            raise NotImplementedError(
                "lossy/extended WebP not supported (lossless VP8L only)")
        pos += 8 + size + (size & 1)
    if payload is None:
        raise ValueError("no VP8L chunk found")

    br = _BitReader(payload)
    if br.read(8) != 0x2F:
        raise ValueError("bad VP8L signature")
    width = br.read(14) + 1
    height = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    transforms: list[tuple[int, tuple]] = []
    while br.read(1):
        ttype = br.read(2)
        if ttype == _T_SUBTRACT_GREEN:
            transforms.append((ttype, ()))
        elif ttype in (_T_PREDICTOR, _T_COLOR):
            block_bits = br.read(3) + 2
            meta_w = (width + (1 << block_bits) - 1) >> block_bits
            meta_h = (height + (1 << block_bits) - 1) >> block_bits
            meta = _decode_image_stream(br, meta_w * meta_h, top_level=False)
            if ttype == _T_PREDICTOR:
                meta = [(px >> 8) & 0xFF for px in meta]  # mode in GREEN
            transforms.append((ttype, (block_bits, meta_w, meta)))
        else:  # PALETTE / color indexing
            size = br.read(8) + 1
            deltas = _decode_image_stream(br, size, top_level=False)
            pal: list[int] = []
            prev = 0
            for d in deltas:  # component-wise cumulative sum mod 256
                prev = _pack(*[
                    (dc + pc) & 0xFF for dc, pc in zip(_unpack(d), _unpack(prev))
                ])
                pal.append(prev)
            transforms.append((ttype, (_palette_width_bits(size), pal)))

    pal_entries = [t for t in transforms if t[0] == _T_PALETTE]
    if pal_entries and len(transforms) > 1:
        raise NotImplementedError(
            "palette combined with other transforms is not supported")
    if pal_entries:
        wb = pal_entries[0][1][0]
        coded_w = (width + (1 << wb) - 1) >> wb
        n_coded = coded_w * height
    else:
        n_coded = width * height
    pixels = _decode_image_stream(br, n_coded, top_level=True)

    # inverse transforms, in reverse stream order (spec: last read, first
    # inverted)
    for ttype, targs in reversed(transforms):
        if ttype == _T_SUBTRACT_GREEN:
            pixels = [
                (px & 0xFF000000)
                | ((((px >> 16) + (px >> 8)) & 0xFF) << 16)
                | (px & 0xFF00)
                | ((px + (px >> 8)) & 0xFF)
                for px in pixels
            ]
        elif ttype == _T_PREDICTOR:
            block_bits, meta_w, modes = targs
            pixels = _apply_inverse_predictor(
                pixels, width, modes, meta_w, block_bits)
        elif ttype == _T_COLOR:
            block_bits, meta_w, meta = targs
            pixels = _apply_inverse_color(
                pixels, width, meta, meta_w, block_bits)
        else:  # PALETTE
            wb, pal = targs
            pixels = _apply_inverse_palette(pixels, width, height, pal, wb)

    has_alpha = any((px >> 24) != 255 for px in pixels)
    ch = 4 if has_alpha else 3
    out = bytearray()
    for px in pixels:
        out.append((px >> 16) & 0xFF)
        out.append((px >> 8) & 0xFF)
        out.append(px & 0xFF)
        if has_alpha:
            out.append((px >> 24) & 0xFF)
    return width, height, ch, bytes(out)
