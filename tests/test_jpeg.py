"""Component tests for the pure-stdlib baseline JPEG codec (operators/jpeg.py)."""

from __future__ import annotations

import pytest

from skinnerdb_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _pattern(w: int, h: int, ch: int) -> bytes:
    px = bytearray()
    for y in range(h):
        for x in range(w):
            if ch == 3:
                px += bytes((min(255, 4 * x + 2 * y), min(255, 100 + 2 * x),
                             max(0, 200 - 3 * y)))
            else:
                px.append(min(255, 30 + 5 * x + 2 * y))
    return bytes(px)


@pytest.mark.parametrize(
    "w,h,ch,quality,subsample,tol",
    [
        (16, 16, 3, 95, False, 6),
        (17, 13, 3, 90, False, 8),     # dims not multiples of 8 (edge replicate)
        (32, 24, 3, 92, True, 10),     # 4:2:0 subsampling + upsampler
        (32, 24, 1, 95, False, 6),     # grayscale single-component path
        (8, 8, 3, 100, False, 3),      # single MCU, max quality
    ],
)
def test_roundtrip_within_tolerance(w, h, ch, quality, subsample, tol):
    px = _pattern(w, h, ch)
    data = encode_jpeg(w, h, px, channels=ch, quality=quality, subsample=subsample)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    dw, dh, dc, out = decode_jpeg(data)
    assert (dw, dh, dc) == (w, h, ch)
    assert len(out) == w * h * ch
    assert max(abs(a - b) for a, b in zip(px, out)) <= tol


def test_near_lossless_smooth_gray():
    px = bytes(min(255, (x + y) // 2) for y in range(16) for x in range(16))
    _, _, _, out = decode_jpeg(encode_jpeg(16, 16, px, channels=1, quality=100))
    assert max(abs(a - b) for a, b in zip(px, out)) <= 1


def test_progressive_rejected():
    # minimal SOI + SOF2 header: decoder must refuse loudly, not mis-decode
    data = b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x10\x00\x10\x01\x01\x11\x00\xff\xd9"
    with pytest.raises(NotImplementedError):
        decode_jpeg(data)


def test_not_jpeg_rejected():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\nrest")


def test_dispatch_from_decode_image():
    from skinnerdb_spark.operators.codecs import decode_image

    px = _pattern(16, 8, 3)
    w, h, c, out = decode_image(encode_jpeg(16, 8, px, quality=95))
    assert (w, h, c) == (16, 8, 3)
    assert max(abs(a - b) for a, b in zip(px, out)) <= 6


def test_bitstream_stuffing_roundtrip():
    # an image engineered to emit 0xFF bytes in the entropy stream exercises
    # byte stuffing on encode and unstuffing on decode
    px = bytes((251 * (x ^ y)) % 256 for y in range(24) for x in range(24))
    dw, dh, dc, out = decode_jpeg(encode_jpeg(24, 24, px, channels=1, quality=50))
    assert (dw, dh, dc) == (24, 24, 1)
    assert len(out) == 24 * 24
