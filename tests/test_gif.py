"""Component tests for the pure-stdlib GIF codec (operators/gif.py)."""

import random
import struct

import pytest

from skinnerdb_spark.operators.gif import (
    decode_gif,
    decode_gif_frames,
    encode_gif,
    lzw_decode,
    lzw_encode,
)


def _pal_rgb(width, height, seed=0, colors=6):
    return bytes(
        ((x * 7 + y * 3 + seed) % colors * 37 + c * 11 + seed) % 256
        for y in range(height)
        for x in range(width)
        for c in range(3)
    )


# ---------------------------------------------------------------- LZW ---


def test_lzw_roundtrip_random_alphabets():
    rng = random.Random(11)
    for alpha, n in [(2, 400), (5, 1000), (17, 3000), (250, 20000)]:
        idx = bytes(rng.randrange(alpha) for _ in range(n))
        mcs = max(2, (alpha - 1).bit_length())
        assert lzw_decode(lzw_encode(idx, mcs), mcs) == idx


def test_lzw_kwkwk_case():
    # abababab... drives the code==next (KwKwK) decoder branch immediately
    idx = bytes([0, 1] * 200)
    assert lzw_decode(lzw_encode(idx, 2), 2) == idx


def test_lzw_table_reset_past_4096():
    # incompressible stream long enough to fill the 4096-entry table and
    # force the encoder's mid-stream clear + width reset
    rng = random.Random(3)
    idx = bytes(rng.randrange(256) for _ in range(30000))
    enc = lzw_encode(idx, 8)
    assert lzw_decode(enc, 8) == idx
    assert len(enc) > 4096  # actually went through multiple width cycles


def test_lzw_runs_compress():
    idx = bytes([7] * 5000)
    enc = lzw_encode(idx, 4)
    assert lzw_decode(enc, 4) == idx
    assert len(enc) < 200  # runs must actually compress


# ---------------------------------------------------------- container ---


def test_gif_roundtrip_exact():
    for w, h, seed in [(1, 1, 0), (13, 7, 2), (37, 23, 5), (64, 64, 9)]:
        rgb = _pal_rgb(w, h, seed)
        dw, dh, dc, out = decode_gif(encode_gif(w, h, rgb))
        assert (dw, dh, dc) == (w, h, 3)
        assert out == rgb


def test_gif_single_color_and_two_color():
    rgb1 = b"\x05\x80\xff" * 12
    assert decode_gif(encode_gif(4, 3, rgb1))[3] == rgb1
    rgb2 = (b"\x00\x00\x00" + b"\xff\xff\xff") * 8
    assert decode_gif(encode_gif(4, 4, rgb2))[3] == rgb2


def test_gif_256_colors_ok_more_raises():
    # exactly 256 distinct grays: encodable
    rgb = b"".join(bytes((i, i, i)) for i in range(256))
    assert decode_gif(encode_gif(16, 16, rgb))[3] == rgb
    # 257 distinct colors: must refuse, not quantize silently
    rgb_over = rgb + b"\x01\x02\x03" + b"\x00\x00\x00" * 15
    with pytest.raises(ValueError, match="256"):
        encode_gif(16, 17, rgb_over)


def test_gif_bad_signature_raises():
    with pytest.raises(ValueError, match="GIF8"):
        decode_gif(b"NOTGIF" + b"\x00" * 20)


def test_decode_image_dispatches_gif():
    from skinnerdb_spark.operators.codecs import decode_image

    rgb = _pal_rgb(9, 5, 1)
    assert decode_image(encode_gif(9, 5, rgb)) == (9, 5, 3, rgb)


# ------------------------------------------------- hand-built variants ---


def _build_gif(
    sw,
    sh,
    palette,
    frames,
    sig=b"GIF89a",
    bg=0,
):
    """Hand-assemble a GIF: ``palette`` list[rgb-bytes] (global), ``frames``
    list of dicts(left, top, w, h, idx, interlace, transparent, disposal,
    local_palette)."""
    bits = max(1, (len(palette) - 1).bit_length())
    out = bytearray(sig)
    out += struct.pack("<HHBBB", sw, sh, 0x80 | (bits - 1), bg, 0)
    out += b"".join(palette) + b"\x00\x00\x00" * ((1 << bits) - len(palette))
    for f in frames:
        if f.get("transparent") is not None or f.get("disposal"):
            flags = (f.get("disposal", 0) << 2) | (
                1 if f.get("transparent") is not None else 0
            )
            out += bytes([0x21, 0xF9, 4, flags, 0, 0, f.get("transparent") or 0, 0])
        lct = f.get("local_palette")
        ipacked = 0x40 if f.get("interlace") else 0
        if lct:
            lbits = max(1, (len(lct) - 1).bit_length())
            ipacked |= 0x80 | (lbits - 1)
        out += struct.pack(
            "<BHHHHB", 0x2C, f.get("left", 0), f.get("top", 0), f["w"], f["h"], ipacked
        )
        if lct:
            out += b"".join(lct) + b"\x00\x00\x00" * ((1 << lbits) - len(lct))
        mcs = max(2, bits)
        out.append(mcs)
        comp = lzw_encode(f["idx"], mcs)
        for i in range(0, len(comp), 255):
            chunk = comp[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


PAL4 = [b"\x00\x00\x00", b"\xff\x00\x00", b"\x00\xff\x00", b"\x00\x00\xff"]


def test_gif_interlaced_decode():
    w, h = 8, 10
    seq = bytes((x + y) % 4 for y in range(h) for x in range(w))
    rows = [seq[y * w : (y + 1) * w] for y in range(h)]
    # write rows in the four-pass interlace order the spec defines
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    inter = b"".join(rows[y] for y in order)
    data = _build_gif(w, h, PAL4, [dict(w=w, h=h, idx=inter, interlace=True)])
    dw, dh, _, rgb = decode_gif(data)
    want = b"".join(PAL4[i] for i in seq)
    assert (dw, dh) == (w, h) and rgb == want


def test_gif87a_and_unpadded_palette():
    data = _build_gif(2, 2, PAL4[:3], [dict(w=2, h=2, idx=bytes([0, 1, 2, 0]))],
                      sig=b"GIF87a")
    assert decode_gif(data)[3] == PAL4[0] + PAL4[1] + PAL4[2] + PAL4[0]


def test_gif_animation_transparency_and_disposal():
    # frame 1: full 4x2 red; frame 2: 2x1 patch at (1,1) green with color 3
    # transparent -> transparent pixel keeps frame 1's red
    f1 = dict(w=4, h=2, idx=bytes([1] * 8))
    f2 = dict(left=1, top=1, w=2, h=1, idx=bytes([2, 3]), transparent=3,
              disposal=2)
    sw, sh = 4, 2
    w_, h_, frames = decode_gif_frames(_build_gif(sw, sh, PAL4, [f1, f2], bg=0))
    assert (w_, h_) == (sw, sh) and len(frames) == 2
    assert frames[0] == PAL4[1] * 8
    # composited frame 2: row 1 = red, row 2 = red, green@x1, RED kept @x2, red
    want = PAL4[1] * 4 + PAL4[1] + PAL4[2] + PAL4[1] + PAL4[1]
    assert frames[1] == want


def test_gif_local_palette_overrides_global():
    lct = [b"\x10\x20\x30", b"\x40\x50\x60"]
    data = _build_gif(
        2, 1, PAL4, [dict(w=2, h=1, idx=bytes([0, 1]), local_palette=lct)]
    )
    assert decode_gif(data)[3] == lct[0] + lct[1]


def test_gif_skips_comment_and_application_extensions():
    base = _build_gif(2, 1, PAL4, [dict(w=2, h=1, idx=bytes([1, 2]))])
    # splice a comment ext + application ext right after the color table
    head, tail = base[: 13 + 3 * 4], base[13 + 3 * 4 :]
    comment = b"\x21\xfe\x05hello\x00"
    app = b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    data = head + comment + app + tail
    assert decode_gif(data)[3] == PAL4[1] + PAL4[2]
