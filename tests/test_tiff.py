"""Baseline TIFF 6.0 codec invariants (operators/tiff.py, r9)."""

from __future__ import annotations

import itertools
import struct

import pytest

from skinnerdb_spark.operators.tiff import (
    decode_tiff,
    encode_tiff,
    packbits_decode,
    packbits_encode,
)


def test_roundtrip_matrix():
    """Every (size, strip-height, compression) combination round-trips
    bit-exactly — multi-strip reassembly and PackBits both load-bearing."""
    for w, h, rps, pb in itertools.product([1, 3, 5, 8], [1, 2, 5, 7], [1, 2, 3, 100], [True, False]):
        px = bytes((i * 37 + (i // 3) * 11) % 256 for i in range(w * h * 3))
        assert decode_tiff(encode_tiff(w, h, px, rows_per_strip=rps, packbits=pb)) == (w, h, 3, px)


def test_packbits_edges():
    for data in [b"", b"a", b"a" * 3, b"a" * 128, b"a" * 129, b"a" * 400,
                 bytes(range(256)), b"ababab" + b"c" * 5]:
        assert packbits_decode(packbits_encode(data), len(data)) == data


def test_big_endian_decode():
    """'MM' files decode too — SHORT tag values are left-justified in the
    4-byte field per spec (the classic big-endian TIFF parsing trap)."""
    w, h = 4, 2
    px = bytes(range(w * h * 3))
    ifd_off, n = 8, 10
    bits_off = ifd_off + 2 + n * 12 + 4
    data_off = bits_off + 6

    def tag_s(tid, cnt, val):
        return struct.pack(">HHIHH", tid, 3, cnt, val, 0)

    def tag_l(tid, cnt, val):
        return struct.pack(">HHII", tid, 4, cnt, val)

    tags = [tag_s(256, 1, w), tag_s(257, 1, h),
            struct.pack(">HHII", 258, 3, 3, bits_off),
            tag_s(259, 1, 1), tag_s(262, 1, 2), tag_l(273, 1, data_off),
            tag_s(277, 1, 3), tag_s(278, 1, h), tag_l(279, 1, len(px)),
            tag_s(284, 1, 1)]
    data = (b"MM" + struct.pack(">HI", 42, ifd_off) + struct.pack(">H", n)
            + b"".join(tags) + struct.pack(">I", 0)
            + struct.pack(">HHH", 8, 8, 8) + px)
    assert decode_tiff(data) == (w, h, 3, px)


def test_loud_failures():
    with pytest.raises(ValueError, match="byte-order"):
        decode_tiff(b"XX" + b"\x00" * 20)
    # LZW compression must refuse, not produce wrong pixels
    good = bytearray(encode_tiff(2, 2, bytes(12), packbits=False))
    # compression tag value lives in the IFD; flip 1 -> 5 (LZW)
    idx = good.find(struct.pack("<HHII", 259, 3, 1, 1))
    assert idx > 0
    good[idx + 8] = 5
    with pytest.raises(ValueError, match="compression"):
        decode_tiff(bytes(good))


def test_dispatch_reaches_tiff():
    from skinnerdb_spark.operators.codecs import decode_image

    px = bytes((i * 3) % 256 for i in range(5 * 4 * 3))
    assert decode_image(encode_tiff(5, 4, px)) == (5, 4, 3, px)
