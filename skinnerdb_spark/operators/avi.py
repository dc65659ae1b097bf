"""Pure-stdlib AVI (RIFF) container codec with MJPEG video frames — closes
the VIDEO modality for real: a spec-layout container parsed from bytes,
each frame an actual baseline JPEG decoded by ``operators/jpeg.py``.

The reference engine has no video path (extension tier; the multimodal
brief asks for frame-sample plumbing).  The layout implemented is the
public AVI RIFF structure:

    RIFF 'AVI ' { LIST 'hdrl' { avih, LIST 'strl' { strh, strf } },
                  LIST 'movi' { '00dc'... }, 'idx1' }

with little-endian fields, word alignment (pad byte after odd-sized
chunks), ``avih`` carrying dims/frame timing, ``strh`` carrying the
rate/scale fps fraction, and one ``00dc`` chunk per compressed frame.

Like the image/audio codecs this is the test-fixture path: per-frame pure
Python is fine for the bounded probe sets; a production 100 TB pass swaps
a native demuxer+decoder behind the same (bytes) -> (meta, frames)
signature while the Spark plumbing stays identical.
"""

from __future__ import annotations

import struct

__all__ = ["encode_avi", "decode_avi"]


def _chunk(cid: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return cid + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi(width: int, height: int, fps: int, frames: list[bytes]) -> bytes:
    """Minimal spec-compliant AVI bytes: one MJPG video stream, one ``00dc``
    chunk per frame, plus an ``idx1`` index (keyframe-flagged)."""
    if fps < 1:
        raise ValueError("encode_avi: fps must be >= 1")
    us_per_frame = 1_000_000 // fps
    max_bytes = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<14I", us_per_frame, max_bytes * fps, 0, 0x10,  # AVIF_HASINDEX
        len(frames), 0, 1, max_bytes, width, height, 0, 0, 0, 0,
    )
    # AVISTREAMHEADER (56 bytes): fccType fccHandler flags priority language
    # initial_frames scale rate start length suggested_buffer quality(-1)
    # sample_size rcFrame(l,t,r,b)
    strh = struct.pack(
        "<4s4sIHHIIIIIIiI4H", b"vids", b"MJPG", 0, 0, 0,
        0, 1, fps, 0, len(frames), max_bytes, -1, 0,
        0, 0, width, height,
    )
    # BITMAPINFOHEADER, biCompression='MJPG'
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_payload)
    # idx1 offsets are relative to the start of the movi LIST payload
    # (i.e. offset of the '00dc' fourcc counted from the 'movi' type word)
    idx_entries = []
    off = 4  # after the 'movi' type word
    for f in frames:
        idx_entries.append(struct.pack("<4sII I", b"00dc", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk(data: bytes, pos: int, end: int):
    """Yield (fourcc, list_type_or_None, payload_start, size) over a RIFF
    chunk run, honoring pad bytes."""
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        if pos + 8 + size > end:
            raise ValueError(f"decode_avi: truncated {cid!r} chunk")
        if cid == b"LIST":
            yield cid, data[pos + 8 : pos + 12], pos + 12, size - 4
        else:
            yield cid, None, pos + 8, size
        pos += 8 + size + (size % 2)


def decode_avi(data: bytes) -> tuple[int, int, int, int, list[bytes]]:
    """Parse AVI bytes -> (width, height, fps, n_frames_declared, frames).

    Walks the real chunk tree: dims and frame count from ``avih``, the fps
    fraction from ``strh`` (rate/scale), frame payloads from the ``movi``
    list's ``00dc``/``00db`` chunks.  Raises loudly on structure errors —
    no silent misreads."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("decode_avi: not a RIFF/AVI stream")
    end = min(len(data), 8 + struct.unpack_from("<I", data, 4)[0])
    avih = None
    strh = None
    frames: list[bytes] = []
    for cid, ltype, p, size in _walk(data, 12, end):
        if cid == b"LIST" and ltype == b"hdrl":
            for c2, l2, p2, s2 in _walk(data, p, p + size):
                if c2 == b"avih":
                    avih = struct.unpack_from("<14I", data, p2)
                elif c2 == b"LIST" and l2 == b"strl":
                    for c3, _l3, p3, s3 in _walk(data, p2, p2 + s2):
                        if c3 == b"strh":
                            if data[p3 : p3 + 4] != b"vids":
                                continue
                            strh = struct.unpack_from("<4s4sIHHIIIIII", data, p3)
        elif cid == b"LIST" and ltype == b"movi":
            for c2, _l2, p2, s2 in _walk(data, p, p + size):
                if c2 in (b"00dc", b"00db"):
                    frames.append(data[p2 : p2 + s2])
    if avih is None:
        raise ValueError("decode_avi: missing avih header")
    if strh is None:
        raise ValueError("decode_avi: missing vids strh header")
    width, height, declared = avih[8], avih[9], avih[4]
    scale, rate = strh[6], strh[7]
    if scale == 0 or rate % scale:
        raise ValueError("decode_avi: non-integer fps fraction")
    if len(frames) != declared:
        raise ValueError(
            f"decode_avi: movi has {len(frames)} frames, header declares {declared}"
        )
    return width, height, rate // scale, declared, frames
