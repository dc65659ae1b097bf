"""Pure-stdlib baseline TIFF 6.0 codec (r9) — encoder + decoder.

The multimodal tier's format set (PNG, BMP, JPEG, WebP/VP8L, GIF, WAV,
AVI/MJPEG) lacked TIFF, the archival/scan format a crawl corpus actually
contains. Implemented from the public TIFF 6.0 specification, from scratch
(no imaging libraries exist in this container, and the repo's codec tier is
deliberately stdlib-only):

- both byte orders ('II' little-endian and 'MM' big-endian — the decoder
  reads either; the encoder emits II);
- the baseline RGB tag set (ImageWidth/ImageLength/BitsPerSample 8,8,8/
  Compression/PhotometricInterpretation=2/StripOffsets/SamplesPerPixel=3/
  RowsPerStrip/StripByteCounts);
- MULTI-STRIP layout (RowsPerStrip < height — strips are TIFF's unit of
  incremental IO, so the decoder must reassemble);
- PackBits compression (Compression=32773, the TIFF 6.0 run-length scheme)
  plus uncompressed (=1).

Loud failures: anything outside this baseline (tiled TIFF, LZW, planar
configuration 2, palette) raises ValueError naming the construct — the
codec-tier contract (no silent wrong pixels).
"""

from __future__ import annotations

import struct

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES_PER_PIXEL = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_BYTE_COUNTS = 279
_TAG_PLANAR = 284

_COMP_NONE = 1
_COMP_PACKBITS = 32773


def packbits_encode(data: bytes) -> bytes:
    """TIFF 6.0 PackBits: repeat runs of >= 3 as (257-n, byte); everything
    else as literal chunks of <= 128."""
    out = bytearray()
    i, n = 0, len(data)
    lit_start = 0

    def flush_literals(end: int) -> None:
        j = lit_start
        while j < end:
            k = min(128, end - j)
            out.append(k - 1)
            out.extend(data[j : j + k])
            j += k

    while i < n:
        run = 1
        while i + run < n and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 3:
            flush_literals(i)
            out.append(257 - run)
            out.append(data[i])
            i += run
            lit_start = i
        else:
            i += run
    flush_literals(i)
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        h = data[i]
        i += 1
        if h < 128:  # literal h+1 bytes
            out.extend(data[i : i + h + 1])
            i += h + 1
        elif h > 128:  # repeat next byte 257-h times
            out.extend(bytes([data[i]]) * (257 - h))
            i += 1
        # h == 128: no-op per spec
    if len(out) != expected:
        raise ValueError(
            f"tiff: PackBits strip decoded to {len(out)} bytes, expected {expected}"
        )
    return bytes(out)


def encode_tiff(
    width: int, height: int, rgb: bytes, rows_per_strip: int = 2, packbits: bool = True
) -> bytes:
    """Spec-compliant little-endian baseline RGB TIFF, multi-strip."""
    if len(rgb) != width * height * 3:
        raise ValueError("encode_tiff: pixel buffer size mismatch")
    strips = []
    for y0 in range(0, height, rows_per_strip):
        raw = rgb[y0 * width * 3 : min(y0 + rows_per_strip, height) * width * 3]
        strips.append(packbits_encode(raw) if packbits else raw)

    n_tags = 10
    # layout: header(8) | IFD | bits array(6) | long arrays | strip data
    ifd_off = 8
    ifd_size = 2 + n_tags * 12 + 4
    bits_off = ifd_off + ifd_size
    arrays_off = bits_off + 6
    n_strips = len(strips)
    if n_strips > 1:
        offsets_off = arrays_off
        counts_off = arrays_off + 4 * n_strips
        data_off = counts_off + 4 * n_strips
    else:
        offsets_off = counts_off = 0  # inlined in the tag
        data_off = arrays_off
    strip_offsets, pos = [], data_off
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)

    def tag(tid: int, typ: int, count: int, value: int) -> bytes:
        return struct.pack("<HHII", tid, typ, count, value)

    tags = [
        tag(_TAG_WIDTH, 3, 1, width),
        tag(_TAG_HEIGHT, 3, 1, height),
        tag(_TAG_BITS, 3, 3, bits_off),
        tag(_TAG_COMPRESSION, 3, 1, _COMP_PACKBITS if packbits else _COMP_NONE),
        tag(_TAG_PHOTOMETRIC, 3, 1, 2),
        tag(
            _TAG_STRIP_OFFSETS, 4, n_strips,
            strip_offsets[0] if n_strips == 1 else offsets_off,
        ),
        tag(_TAG_SAMPLES_PER_PIXEL, 3, 1, 3),
        tag(_TAG_ROWS_PER_STRIP, 3, 1, rows_per_strip),
        tag(
            _TAG_STRIP_BYTE_COUNTS, 4, n_strips,
            len(strips[0]) if n_strips == 1 else counts_off,
        ),
        tag(_TAG_PLANAR, 3, 1, 1),
    ]
    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, ifd_off)
    out += struct.pack("<H", n_tags) + b"".join(tags) + struct.pack("<I", 0)
    out += struct.pack("<HHH", 8, 8, 8)
    if n_strips > 1:
        out += struct.pack(f"<{n_strips}I", *strip_offsets)
        out += struct.pack(f"<{n_strips}I", *[len(s) for s in strips])
    for s in strips:
        out += s
    return bytes(out)


def decode_tiff(data: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, channels, RGB bytes) from a baseline RGB TIFF —
    either byte order, multi-strip, Compression 1 or 32773."""
    if data[:2] == b"II":
        e = "<"
    elif data[:2] == b"MM":
        e = ">"
    else:
        raise ValueError("tiff: bad byte-order mark")
    magic, ifd_off = struct.unpack(e + "HI", data[2:8])
    if magic != 42:
        raise ValueError("tiff: bad magic")
    n_tags = struct.unpack(e + "H", data[ifd_off : ifd_off + 2])[0]
    tags: dict[int, tuple[int, int, bytes]] = {}
    for i in range(n_tags):
        o = ifd_off + 2 + i * 12
        tid, typ, count = struct.unpack(e + "HHI", data[o : o + 8])
        tags[tid] = (typ, count, data[o + 8 : o + 12])

    _SZ = {1: 1, 3: 2, 4: 4}

    def values(tid: int, default: list[int] | None = None) -> list[int]:
        if tid not in tags:
            if default is not None:
                return default
            raise ValueError(f"tiff: missing required tag {tid}")
        typ, count, raw = tags[tid]
        if typ not in _SZ:
            raise ValueError(f"tiff: unsupported tag type {typ} for tag {tid}")
        total = _SZ[typ] * count
        buf = raw[:total] if total <= 4 else None
        if buf is None:
            off = struct.unpack(e + "I", raw)[0]
            buf = data[off : off + total]
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        return list(struct.unpack(f"{e}{count}{fmt}", buf))

    width = values(_TAG_WIDTH)[0]
    height = values(_TAG_HEIGHT)[0]
    spp = values(_TAG_SAMPLES_PER_PIXEL, [1])[0]
    bits = values(_TAG_BITS, [8])
    comp = values(_TAG_COMPRESSION, [1])[0]
    photo = values(_TAG_PHOTOMETRIC)[0]
    planar = values(_TAG_PLANAR, [1])[0]
    if spp != 3 or photo != 2:
        raise ValueError(f"tiff: only baseline RGB supported (spp={spp}, photometric={photo})")
    if any(b != 8 for b in bits):
        raise ValueError(f"tiff: only 8-bit samples supported (bits={bits})")
    if planar != 1:
        raise ValueError("tiff: planar configuration 2 not supported")
    if comp not in (_COMP_NONE, _COMP_PACKBITS):
        raise ValueError(f"tiff: unsupported compression {comp} (baseline + PackBits only)")
    if _TAG_STRIP_OFFSETS not in tags:
        raise ValueError("tiff: tiled TIFF not supported (no strip offsets)")
    offsets = values(_TAG_STRIP_OFFSETS)
    counts = values(_TAG_STRIP_BYTE_COUNTS)
    rps = values(_TAG_ROWS_PER_STRIP, [height])[0]
    out = bytearray()
    for i, (off, cnt) in enumerate(zip(offsets, counts)):
        rows = min(rps, height - i * rps)
        expected = rows * width * 3
        raw = data[off : off + cnt]
        out += packbits_decode(raw, expected) if comp == _COMP_PACKBITS else raw[:expected]
    if len(out) != width * height * 3:
        raise ValueError(f"tiff: strip reassembly produced {len(out)} bytes")
    return width, height, 3, bytes(out)
