"""Pure-stdlib RIFF/WAVE codec (PCM 16-bit) — closes the AUDIO modality the
way ``operators/codecs.py`` (PNG/BMP) and ``operators/jpeg.py`` closed
images: a real container format parsed from bytes, not a fake.

The reference engine has no audio path (extension tier; the multimodal
columns brief asks for audio feature-extraction plumbing).  Everything here
implements the public RIFF/WAVE layout: little-endian chunks, word (2-byte)
alignment with pad bytes after odd-sized chunks, a ``fmt `` chunk describing
PCM framing, and interleaved int16 frames in ``data``.

Like the image codecs this is the *test-fixture* path: per-sample Python is
fine for the bounded probe sets the registry entries use; a production
100 TB pass swaps a native decoder behind the same (bytes) -> (meta, frames)
signature while the Spark-side plumbing (Arrow batches, schema, zero
shuffle) stays identical.
"""

from __future__ import annotations

import struct

__all__ = ["encode_wav", "decode_wav"]


def encode_wav(sample_rate: int, channels: int, samples: list[int]) -> bytes:
    """Spec-compliant RIFF/WAVE bytes for interleaved 16-bit PCM.

    ``samples`` is the interleaved frame stream (len must be a multiple of
    ``channels``); values must fit int16.
    """
    if channels < 1:
        raise ValueError("encode_wav: channels must be >= 1")
    if len(samples) % channels:
        raise ValueError("encode_wav: samples not a whole number of frames")
    data = struct.pack(f"<{len(samples)}h", *samples)
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align,
        block_align, 16,
    )
    chunks = b"".join(
        _chunk(cid, payload) for cid, payload in ((b"fmt ", fmt), (b"data", data))
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _chunk(cid: bytes, payload: bytes) -> bytes:
    # RIFF word alignment: an odd-sized chunk is followed by one pad byte
    # that is NOT counted in the stored size.
    pad = b"\x00" if len(payload) % 2 else b""
    return cid + struct.pack("<I", len(payload)) + payload + pad


def decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    """Parse RIFF/WAVE bytes -> (sample_rate, channels, interleaved int16
    samples).  Walks the real chunk structure (skipping LIST/fact/unknown
    chunks and honoring pad bytes) and raises loudly on anything that is
    not integer PCM 16-bit — no silent misreads."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("decode_wav: not a RIFF/WAVE stream")
    riff_size = struct.unpack_from("<I", data, 4)[0]
    end = min(len(data), 8 + riff_size)
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        payload = data[pos + 8 : pos + 8 + size]
        if len(payload) < size:
            raise ValueError(f"decode_wav: truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("decode_wav: fmt chunk too small")
            fmt = struct.unpack_from("<HHIIHH", payload, 0)
        elif cid == b"data":
            pcm = payload
        # anything else (LIST/fact/cue ...) is skipped per the spec
        pos += 8 + size + (size % 2)
    if fmt is None or pcm is None:
        raise ValueError("decode_wav: missing fmt or data chunk")
    audio_format, channels, sample_rate, _byte_rate, block_align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"decode_wav: only PCM16 supported (format={audio_format}, bits={bits})"
        )
    if block_align != channels * 2:
        raise ValueError("decode_wav: block_align inconsistent with PCM16 framing")
    n = len(pcm) // 2
    if n % max(channels, 1):
        raise ValueError("decode_wav: data chunk is not a whole number of frames")
    return sample_rate, channels, list(struct.unpack(f"<{n}h", pcm[: n * 2]))
