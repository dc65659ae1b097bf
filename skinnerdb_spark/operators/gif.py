"""Pure-stdlib GIF codec (GIF87a/89a, LZW) — the fifth real image format.

Joins PNG/BMP (operators/codecs.py), baseline JPEG (operators/jpeg.py) and
lossless WebP/VP8L (operators/webp.py): everything implemented from the
public specs (GIF89a specification, CompuServe 1990) with nothing beyond
``struct``. GIF is the one mainstream format whose compression is LZW with
*variable-width* codes (3..12 bits, LSB-first), so it exercises a codepath
none of the other codecs touch.

Supported:

- decode: 87a + 89a, global and local color tables, interlaced images
  (four-pass row ordering), extension blocks (graphic control, comment,
  application) parsed or skipped per spec, transparency, and multi-frame
  animations composited to full-canvas RGB frames (disposal methods
  0/1 "leave" and 2 "restore to background");
- encode: single-frame, palette-built-from-pixels (raises if the image has
  more than 256 distinct colors — GIF is indexed color; quantization is a
  lossy choice the caller must make), non-interlaced, spec-compliant LZW
  with table reset at 4096 entries.

Decoders return ``(width, height, 3, pixels)`` with ``pixels`` top-down
row-major RGB bytes — the same layout every other codec in this package
uses. Scale shape: plain per-payload byte functions; the distributed story
stays mapInPandas over Arrow batches (operators/multimodal.py).
"""

from __future__ import annotations

import struct

GIF_SIGS = (b"GIF87a", b"GIF89a")

# ---------------------------------------------------------------------------
# LZW (GIF variant: variable 3..12-bit codes, LSB-first, clear/end codes)
# ---------------------------------------------------------------------------


def lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """GIF-LZW decompress ``data`` (concatenated sub-block payloads)."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    # table as list of bytes; indices 0..clear-1 are literals
    base = [bytes((i,)) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < code_size:
            if pos >= n:
                return bytes(out)  # truncated stream: emit what we have
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            return bytes(out)
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"corrupt LZW stream: code {code} of {len(table)}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return bytes(out)


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF-LZW compress palette indices; emits clear up front and resets
    the table when it fills (4096 entries), exactly mirroring
    ``lzw_decode``'s width-growth schedule."""
    clear = 1 << min_code_size
    end = clear + 1

    out = bytearray()
    acc = nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh() -> dict[bytes, int]:
        return {bytes((i,)): i for i in range(clear)}

    code_size = min_code_size + 1
    table = fresh()
    next_code = end + 1
    emit(clear, code_size)
    w = b""
    for b in indices:
        k = bytes((b,))
        wk = w + k
        if wk in table:
            w = wk
            continue
        emit(table[w], code_size)
        if next_code < 4096:
            table[wk] = next_code
            # decoder grows width right after ADDING the entry whose value
            # fills the current range — match it so the next code we emit
            # is read at the size the decoder expects
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
            next_code += 1
        else:
            emit(clear, code_size)
            table = fresh()
            code_size = min_code_size + 1
            next_code = end + 1
        w = k
    if w:
        emit(table[w], code_size)
    emit(end, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# container parsing
# ---------------------------------------------------------------------------


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at ``pos``; return (payload,
    position after the 0x00 terminator)."""
    chunks = []
    while True:
        ln = data[pos]
        pos += 1
        if ln == 0:
            return b"".join(chunks), pos
        chunks.append(data[pos : pos + ln])
        pos += ln


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: list[bytes], height: int) -> list[bytes]:
    out: list[bytes] = [b""] * height
    i = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, height, step):
            out[y] = rows[i]
            i += 1
    return out


def decode_gif_frames(data: bytes) -> tuple[int, int, list[bytes]]:
    """Decode every frame of a (possibly animated) GIF, composited onto the
    logical-screen canvas per the 89a disposal model. Returns
    ``(width, height, frames)`` — each frame full-canvas top-down RGB."""
    if data[:6] not in GIF_SIGS:
        raise ValueError("not a GIF (missing GIF87a/GIF89a signature)")
    sw, sh, packed, bg_idx, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct: bytes | None = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = data[pos : pos + 3 * n]
        pos += 3 * n

    # canvas starts as the background color (or black without a GCT)
    if gct is not None and 3 * bg_idx + 3 <= len(gct):
        bg_rgb = gct[3 * bg_idx : 3 * bg_idx + 3]
    else:
        bg_rgb = b"\x00\x00\x00"
    canvas = bytearray(bg_rgb * (sw * sh))

    frames: list[bytes] = []
    transparent: int | None = None
    disposal = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                payload, pos = _sub_blocks(data, pos)
                flags = payload[0]
                disposal = (flags >> 2) & 0x07
                transparent = payload[3] if flags & 0x01 else None
            else:  # comment / application / plain-text: skip
                _, pos = _sub_blocks(data, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            lct = data[pos : pos + 3 * n]
            pos += 3 * n
        else:
            lct = gct
        if lct is None:
            raise ValueError("GIF image block with no color table")
        mcs = data[pos]
        pos += 1
        payload, pos = _sub_blocks(data, pos)
        idx = lzw_decode(payload, mcs)
        if len(idx) < w * h:
            raise ValueError(f"GIF frame short: {len(idx)} < {w * h} indices")
        rows = [idx[y * w : (y + 1) * w] for y in range(h)]
        if ipacked & 0x40:
            rows = _deinterlace(rows, h)

        before = bytes(canvas) if disposal == 3 else None
        for y, row in enumerate(rows):
            cy = top + y
            if cy >= sh:
                break
            for x, ci in enumerate(row):
                cx = left + x
                if cx >= sw or ci == transparent:
                    continue
                o = 3 * (cy * sw + cx)
                canvas[o : o + 3] = lct[3 * ci : 3 * ci + 3]
        frames.append(bytes(canvas))
        if disposal == 2:  # restore the frame's region to background
            for y in range(top, min(top + h, sh)):
                o = 3 * (y * sw + left)
                span = min(w, sw - left)
                canvas[o : o + 3 * span] = bg_rgb * span
        elif disposal == 3 and before is not None:  # restore to previous
            canvas = bytearray(before)
        disposal = 0
        transparent = None
    if not frames:
        raise ValueError("GIF contains no image data")
    return sw, sh, frames


def decode_gif(data: bytes) -> tuple[int, int, int, bytes]:
    """First (or only) frame as ``(width, height, 3, rgb)`` — the shared
    codec return shape (codecs.decode_image dispatch)."""
    w, h, frames = decode_gif_frames(data)
    return w, h, 3, frames[0]


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def encode_gif(width: int, height: int, rgb: bytes) -> bytes:
    """Single-frame GIF89a from top-down RGB bytes. The palette is built
    from the distinct colors present; >256 distinct colors raises (GIF is
    indexed color — quantize first if you mean to be lossy)."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} RGB bytes, got {len(rgb)}")
    palette: dict[bytes, int] = {}
    indices = bytearray()
    for i in range(0, len(rgb), 3):
        c = rgb[i : i + 3]
        ci = palette.get(c)
        if ci is None:
            ci = len(palette)
            if ci == 256:
                raise ValueError("more than 256 distinct colors; quantize first")
            palette[c] = ci
        indices.append(ci)
    # color-table size: power of two >= max(2, len(palette))
    bits = max(1, (len(palette) - 1).bit_length())
    table = b"".join(palette) + b"\x00\x00\x00" * ((1 << bits) - len(palette))
    mcs = max(2, bits)  # LZW min code size must be >= 2 per spec

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | ((bits - 1) & 0x07), 0, 0)
    out += table
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, 0)
    out.append(mcs)
    comp = lzw_encode(bytes(indices), mcs)
    for i in range(0, len(comp), 255):
        chunk = comp[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
