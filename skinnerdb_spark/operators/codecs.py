"""Pure-stdlib image codecs (PNG + BMP) — closing the multimodal decode stub.

This container has no PIL/cv2/ffmpeg, but PNG and BMP are decodable with
nothing beyond ``zlib`` + ``struct``: PNG is IHDR/IDAT chunks, one zlib
stream, five per-scanline filters; BMP is two fixed headers and padded
bottom-up rows. That is enough to make the multimodal pipeline's decode
step REAL for the two formats; baseline JPEG joined in r7
(operators/jpeg.py), WAV audio and AVI/MJPEG video in operators/audio.py
and operators/avi.py. ``decode_image`` raises for anything else (WebP,
progressive JPEG) with the formats it does support named.

Decoders return ``(width, height, channels, pixels)`` with ``pixels`` a
top-down row-major ``bytes`` of ``width*height*channels`` samples, 8 bits
each — the layout the feature extractors consume. Encoders exist so the
engine can round-trip test itself (and generate fixtures) without any
external library; they are spec-compliant, so any external tool can read
their output.

Scale shape: codecs are plain per-payload byte functions — the distributed
story stays mapInPandas over Arrow batches (operators/multimodal.py);
nothing here touches Spark.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed, BITMAPINFOHEADER)
# ---------------------------------------------------------------------------


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """24-bit BI_RGB BMP from top-down row-major RGB bytes."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"need {width * height * 3} RGB bytes, got {len(rgb)}")
    row_raw = width * 3
    pad = (4 - row_raw % 4) % 4
    body = bytearray()
    # BMP stores rows bottom-up, samples as BGR
    for y in range(height - 1, -1, -1):
        row = rgb[y * row_raw : (y + 1) * row_raw]
        for x in range(width):
            r, g, b = row[x * 3 : x * 3 + 3]
            body += bytes((b, g, r))
        body += b"\x00" * pad
    header_size = 14 + 40
    file_size = header_size + len(body)
    return (
        struct.pack("<2sIHHI", b"BM", file_size, 0, 0, header_size)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0)
        + bytes(body)
    )


def decode_bmp(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode 24/32-bit uncompressed BMP -> (w, h, 3, top-down RGB bytes)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP file")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    width, height = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression != 0:
        raise NotImplementedError(f"compressed BMP (method {compression}) not supported")
    if bpp not in (24, 32):
        raise NotImplementedError(f"{bpp}-bit BMP not supported (24/32 only)")
    bottom_up = height > 0
    height = abs(height)
    nbytes = bpp // 8
    row_raw = width * nbytes
    stride = (row_raw + 3) & ~3
    out = bytearray(width * height * 3)
    for y in range(height):
        src_y = (height - 1 - y) if bottom_up else y
        base = pixel_off + src_y * stride
        for x in range(width):
            px = base + x * nbytes
            b, g, r = data[px], data[px + 1], data[px + 2]
            o = (y * width + x) * 3
            out[o : o + 3] = bytes((r, g, b))
    return width, height, 3, bytes(out)


# ---------------------------------------------------------------------------
# PNG (8-bit gray / RGB / RGBA, all five scanline filters)
# ---------------------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples per pixel


def encode_png(width: int, height: int, pixels: bytes, channels: int = 3) -> bytes:
    """8-bit PNG (filter 0 on every scanline) from top-down row-major bytes."""
    color_type = {1: 0, 3: 2, 4: 6}.get(channels)
    if color_type is None:
        raise ValueError("channels must be 1 (gray), 3 (RGB) or 4 (RGBA)")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    raw = bytearray()
    stride = width * channels
    for y in range(height):
        raw.append(0)  # filter type None
        raw += pixels[y * stride : (y + 1) * stride]

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode 8-bit non-interlaced PNG -> (w, h, channels, top-down bytes)."""
    if data[: len(PNG_SIG)] != PNG_SIG:
        raise ValueError("not a PNG file")
    pos = len(PNG_SIG)
    width = height = channels = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8:
                raise NotImplementedError(f"bit depth {depth} not supported (8 only)")
            if interlace:
                raise NotImplementedError("interlaced PNG not supported")
            if color_type not in _PNG_CHANNELS:
                raise NotImplementedError(f"palette color type {color_type} not supported")
            channels = _PNG_CHANNELS[color_type]
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG scanline data size mismatch")
    out = bytearray(stride * height)
    prev = bytearray(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                ul = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return width, height, channels, bytes(out)


def decode_image(data: bytes) -> tuple[int, int, int, bytes]:
    """Dispatch on magic bytes. PNG, BMP, baseline JPEG, lossless WebP
    (VP8L, operators/webp.py — r7), and GIF (operators/gif.py — r7) decode
    for real, pure stdlib; anything else (lossy WebP, video, progressive
    JPEG) raises — those codecs genuinely are not in this container, and
    silently faking them would poison downstream features."""
    if data[: len(PNG_SIG)] == PNG_SIG:
        return decode_png(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] == b"\xff\xd8":
        from skinnerdb_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(data)
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        from skinnerdb_spark.operators.webp import decode_webp

        return decode_webp(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        from skinnerdb_spark.operators.gif import decode_gif

        return decode_gif(data)
    if data[:2] in (b"II", b"MM"):
        from skinnerdb_spark.operators.tiff import decode_tiff

        return decode_tiff(data)
    raise NotImplementedError(
        "only PNG, BMP, baseline JPEG, lossless WebP, GIF, and baseline "
        "TIFF decode in this environment (pure-stdlib codecs); lossy "
        "WebP/video need external libraries"
    )
