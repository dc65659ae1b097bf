"""Component tests for the pure-stdlib lossless WebP/VP8L codec
(operators/webp.py): exhaustive lossless round-trips across the bitstream
feature matrix (color cache on/off/size, LZ77 on/off, simple vs normal
prefix codes, RGB vs RGBA), container/bit-layout structure, and the honest
NotImplementedError guards."""

from __future__ import annotations

import random
import struct

import pytest

from skinnerdb_spark.operators.codecs import decode_image
from skinnerdb_spark.operators.webp import decode_webp, encode_webp


def _gradient(w: int, h: int) -> bytes:
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes(((x * 7 + y * 3) % 256, (x * 2 + y * 11) % 256,
                         (255 - x * 3 - y) % 256))
    return bytes(px)


def _noisy_runs(w: int, h: int, seed: int = 7) -> bytes:
    rng = random.Random(seed)
    px = bytearray()
    for y in range(h):
        if y % 3 == 0:  # constant rows -> LZ77 backward references
            px += bytes((13, 200, 55)) * w
        else:  # noise -> full normal prefix codes
            px += bytes(rng.randrange(256) for _ in range(3 * w))
    return bytes(px)


@pytest.mark.parametrize("w,h", [(1, 1), (2, 3), (16, 12), (33, 7), (64, 64)])
def test_roundtrip_gradient(w, h):
    px = _gradient(w, h)
    dw, dh, dc, out = decode_webp(encode_webp(w, h, px, channels=3))
    assert (dw, dh, dc) == (w, h, 3)
    assert out == px  # lossless: bit-exact


@pytest.mark.parametrize(
    "kwargs",
    [
        {},                                     # cache + lz77 (default)
        {"cache_bits": 0},                      # no color cache
        {"use_lz77": False},                    # literals + cache only
        {"cache_bits": 0, "use_lz77": False},   # pure literal stream
        {"cache_bits": 10},                     # large cache
        {"cache_bits": 1},                      # minimal cache
    ],
)
def test_roundtrip_feature_matrix(kwargs):
    px = _noisy_runs(32, 21)
    dw, dh, dc, out = decode_webp(encode_webp(32, 21, px, channels=3, **kwargs))
    assert (dw, dh, dc) == (32, 21, 3)
    assert out == px


def test_roundtrip_constant_image_compresses():
    px = bytes((10, 20, 30)) * (64 * 64)
    data = encode_webp(64, 64, px, channels=3)
    assert len(data) < 100  # one literal + LZ77 runs, not 12 KiB
    assert decode_webp(data)[3] == px


def test_roundtrip_two_color_image_uses_simple_codes():
    px = bytearray()
    for i in range(24 * 24):
        px += bytes((0, 0, 0) if (i // 24 + i) % 2 else (255, 255, 255))
    dw, dh, dc, out = decode_webp(encode_webp(24, 24, bytes(px), channels=3))
    assert out == bytes(px)


def test_rgba_alpha_preserved_and_opaque_collapses():
    px = bytearray()
    for i in range(16 * 12):
        px += bytes((i % 256, (i * 3) % 256, (i * 7) % 256, 100 + i % 100))
    dw, dh, dc, out = decode_webp(encode_webp(16, 12, bytes(px), channels=4))
    assert dc == 4 and out == bytes(px)
    opaque = bytes(b if i % 4 != 3 else 255 for i, b in enumerate(px))
    dw, dh, dc, out = decode_webp(encode_webp(16, 12, opaque, channels=4))
    assert dc == 3  # fully-opaque RGBA decodes as RGB
    assert out == bytes(b for i, b in enumerate(opaque) if i % 4 != 3)


def test_container_structure():
    data = encode_webp(5, 4, _gradient(5, 4), channels=3)
    assert data[:4] == b"RIFF" and data[8:12] == b"WEBP"
    assert struct.unpack("<I", data[4:8])[0] == len(data) - 8
    assert data[12:16] == b"VP8L"
    assert data[20] == 0x2F  # VP8L signature byte
    # 14-bit width-1 starts at the next bit: low byte carries (w-1) & 0xff
    assert data[21] & 0x3F == 4  # (5-1) in the low 6 bits read LSB-first


def test_codecs_dispatch_routes_webp():
    px = _gradient(9, 6)
    w, h, c, out = decode_image(encode_webp(9, 6, px, channels=3))
    assert (w, h, c) == (9, 6, 3) and out == px


def test_lossy_webp_guarded():
    fake = b"RIFF" + struct.pack("<I", 16) + b"WEBPVP8 " + b"\x00" * 8
    with pytest.raises(NotImplementedError, match="lossless"):
        decode_webp(fake)


def test_bad_container_rejected():
    with pytest.raises(ValueError):
        decode_webp(b"JUNKJUNKJUNKJUNK")


def test_encode_validates_inputs():
    with pytest.raises(ValueError):
        encode_webp(4, 4, b"\x00" * 10, channels=3)  # wrong buffer size
    with pytest.raises(ValueError):
        encode_webp(2, 2, b"\x00" * 8, channels=2)   # bad channel count


def test_subtract_green_transform_roundtrip():
    px = _gradient(31, 17)
    data = encode_webp(31, 17, px, channels=3, subtract_green=True)
    dw, dh, dc, out = decode_webp(data)
    assert (dw, dh, dc) == (31, 17, 3)
    assert out == px
    # decorrelated channels should not be larger on gradient content
    plain = encode_webp(31, 17, px, channels=3)
    assert len(data) <= len(plain) * 1.1


def test_subtract_green_with_alpha_and_cache_matrix():
    px = bytearray()
    for i in range(20 * 9):
        px += bytes((i % 256, (i * 3) % 256, (i * 7) % 256, 50 + i % 200))
    for kw in ({}, {"cache_bits": 0}, {"use_lz77": False}):
        dw, dh, dc, out = decode_webp(
            encode_webp(20, 9, bytes(px), channels=4, subtract_green=True, **kw))
        assert dc == 4 and out == bytes(px)


def test_meta_prefix_codes_guarded():
    # all four transforms decode now; meta prefix codes are the remaining
    # honest guard — hand-build a header announcing them
    from skinnerdb_spark.operators.webp import _BitWriter

    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(3, 14)  # w-1
    bw.write(3, 14)  # h-1
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(1, 1)  # meta prefix codes present
    payload = bw.bytes() + b"\x00" * 8
    data = (b"RIFF" + struct.pack("<I", 12 + len(payload)) + b"WEBP"
            + b"VP8L" + struct.pack("<I", len(payload)) + payload)
    with pytest.raises(NotImplementedError, match="meta prefix"):
        decode_webp(data)


@pytest.mark.parametrize("w,h", [(16, 16), (33, 21), (7, 5), (1, 1), (40, 3)])
def test_predictor_transform_roundtrip(w, h):
    px = _gradient(w, h)
    data = encode_webp(w, h, px, channels=3, predictor=True)
    dw, dh, dc, out = decode_webp(data)
    assert (dw, dh, dc) == (w, h, 3)
    assert out == px


def test_predictor_compresses_smooth_content():
    # smooth gradients predict almost perfectly -> residuals are tiny
    px = _gradient(64, 64)
    pred = encode_webp(64, 64, px, channels=3, predictor=True)
    plain = encode_webp(64, 64, px, channels=3)
    assert len(pred) < len(plain)
    assert decode_webp(pred)[3] == px


def test_predictor_on_noise_and_alpha():
    rng = random.Random(11)
    px = bytearray()
    for i in range(24 * 18):
        px += bytes((rng.randrange(256), rng.randrange(256),
                     rng.randrange(256), 1 + rng.randrange(255)))
    data = encode_webp(24, 18, bytes(px), channels=4, predictor=True)
    dw, dh, dc, out = decode_webp(data)
    assert dc == 4 and out == bytes(px)


def test_predictor_and_subtract_green_mutually_exclusive():
    with pytest.raises(ValueError, match="mutually exclusive"):
        encode_webp(2, 2, b"\x00" * 12, channels=3,
                    predictor=True, subtract_green=True)


def test_all_fourteen_predictor_modes_roundtrip(monkeypatch):
    """Force the encoder to consider every spec predictor mode so each
    mode's encode/decode pair is exercised (the default encoder uses a
    cheap subset)."""
    import skinnerdb_spark.operators.webp as W

    monkeypatch.setattr(W, "_ENC_MODES", tuple(range(14)))
    px = _noisy_runs(48, 33, seed=3)
    data = encode_webp(48, 33, px, channels=3, predictor=True)
    assert decode_webp(data)[3] == px
    grad = _gradient(37, 29)
    assert decode_webp(encode_webp(37, 29, grad, channels=3,
                                   predictor=True))[3] == grad


def _correlated(w, h, seed=5):
    """Channels correlated with green (the COLOR transform's target)."""
    rng = random.Random(seed)
    px = bytearray()
    for _ in range(w * h):
        g = rng.randrange(256)
        px += bytes(((g + rng.randrange(-20, 21)) & 0xFF, g,
                     (255 - g + rng.randrange(-20, 21)) & 0xFF))
    return bytes(px)


@pytest.mark.parametrize("w,h", [(16, 16), (33, 21), (5, 3), (1, 1)])
def test_color_transform_roundtrip(w, h):
    px = _correlated(w, h)
    data = encode_webp(w, h, px, channels=3, color_transform=True)
    dw, dh, dc, out = decode_webp(data)
    assert (dw, dh, dc) == (w, h, 3)
    assert out == px


def test_color_transform_alpha_and_noise():
    rng = random.Random(13)
    px = bytes(rng.randrange(256) for _ in range(20 * 11 * 4))
    dw, dh, dc, out = decode_webp(
        encode_webp(20, 11, px, channels=4, color_transform=True))
    assert out == px


def test_single_transform_at_a_time():
    with pytest.raises(ValueError, match="mutually exclusive"):
        encode_webp(2, 2, b"\x00" * 12, channels=3,
                    predictor=True, color_transform=True)


@pytest.mark.parametrize("n_colors,wb_px", [(2, 8), (4, 4), (16, 2), (100, 1)])
def test_palette_transform_roundtrip(n_colors, wb_px):
    """Color indexing across every bundling tier: 2 colors -> 8 indices
    per coded pixel, 4 -> 4, 16 -> 2, >16 -> none."""
    rng = random.Random(n_colors)
    colors = [(rng.randrange(256), rng.randrange(256), rng.randrange(256))
              for _ in range(n_colors)]
    w, h = 21, 13  # deliberately not a multiple of any bundling factor
    px = bytearray()
    for i in range(w * h):
        px += bytes(colors[(i * 7 + i // w) % n_colors])
    data = encode_webp(w, h, bytes(px), channels=3, palette=True)
    dw, dh, dc, out = decode_webp(data)
    assert (dw, dh, dc) == (w, h, 3)
    assert out == bytes(px)


def test_palette_compresses_few_color_content():
    px = bytearray()
    for i in range(64 * 64):
        px += bytes((255, 0, 0) if (i // 64 + i) % 3 else (0, 0, 255))
    pal = encode_webp(64, 64, bytes(px), channels=3, palette=True)
    plain = encode_webp(64, 64, bytes(px), channels=3)
    assert len(pal) < len(plain)
    assert decode_webp(pal)[3] == bytes(px)


def test_palette_with_alpha_and_too_many_colors():
    px = bytearray()
    for i in range(10 * 10):
        px += bytes((i % 3, (i % 3) * 40, 7, 128 + (i % 2)))
    data = encode_webp(10, 10, bytes(px), channels=4, palette=True)
    assert decode_webp(data)[3] == bytes(px)
    rng = random.Random(99)
    big = bytes(rng.randrange(256) for _ in range(40 * 40 * 3))
    with pytest.raises(ValueError, match="256 distinct"):
        encode_webp(40, 40, big, channels=3, palette=True)
