"""Pure-Python codecs for uncompressed media containers: BMP, WAV, Y4M.

The container ships no imaging/audio libraries, but the uncompressed
formats need none — their public specs are a few dozen header bytes:

- BMP (BITMAPFILEHEADER + BITMAPINFOHEADER, 24-bit, bottom-up,
  4-byte-padded rows) — the Windows bitmap format;
- WAV (RIFF/WAVE, PCM16 mono) — canonical chunk layout;
- Y4M (YUV4MPEG2, C420: full-res Y plane + 2 half-res chroma planes per
  FRAME) — the raw-video interchange format used by ffmpeg/mjpegtools.

Encoders fabricate deterministic payloads for tests/synthetic tables;
decoders parse real header fields (dimensions, sample counts, declared
byte sizes) and expose the raw sample planes for featurization.  All byte
handling is numpy (`frombuffer`) — no per-byte Python loops.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

Y4M_MAGIC = b"YUV4MPEG2 "
Y4M_FPS = 25  # fixed F25:1 -> 40 ms per frame


@dataclass(frozen=True)
class MediaInfo:
    """Parsed header facts; samples is the decoded uint8 intensity plane
    (BGR bytes for BMP, 8-bit-folded PCM for WAV, Y plane for Y4M)."""

    format: str
    width: int
    height: int
    n_frames: int
    sample_rate: int
    duration_ms: int
    declared_bytes: int
    samples: np.ndarray


def _tile(content: bytes, n: int) -> np.ndarray:
    src = np.frombuffer(content or b"\x00", dtype=np.uint8)
    reps = -(-n // len(src))
    return np.tile(src, reps)[:n]


# -- BMP ---------------------------------------------------------------------


def encode_bmp(width: int, height: int, content: bytes) -> bytes:
    row = (3 * width + 3) // 4 * 4  # rows pad to 4 bytes
    size = 54 + row * height
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", size, 0, 0, 54,          # file header: magic, size, res, offset
        40, width, height, 1, 24,       # info header: size, dims, planes, bpp
        0, row * height, 2835, 2835, 0, 0,
    )
    return header + _tile(content, row * height).tobytes()


def decode_bmp(payload: bytes) -> MediaInfo:
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    size, _, _, offset = struct.unpack_from("<IHHI", payload, 2)
    _, width, height, _, bpp = struct.unpack_from("<IiiHH", payload, 14)
    height = abs(height)
    if bpp != 24:
        raise ValueError(f"only 24-bit BMP supported, got {bpp}")
    pixels = np.frombuffer(payload, dtype=np.uint8, offset=offset)
    return MediaInfo("bmp", width, height, 1, 0, 0, size, pixels)


# -- WAV (PCM16 mono) --------------------------------------------------------


def encode_wav(n_samples: int, sample_rate: int, content: bytes) -> bytes:
    samples = (_tile(content, n_samples).astype(np.int16) - 128) * 256
    data = samples.tobytes()
    header = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate,       # PCM, mono
        sample_rate * 2, 2, 16,               # byte rate, block align, bits
        b"data", len(data),
    )
    return header + data


def decode_wav(payload: bytes) -> MediaInfo:
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    riff_size = struct.unpack_from("<I", payload, 4)[0]
    pos, sample_rate, data = 12, 0, b""
    while pos + 8 <= len(payload):  # chunk walk: id, size, body
        cid, csize = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + csize]
        if cid == b"fmt ":
            _, _, sample_rate = struct.unpack_from("<HHI", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)
    n = len(data) // 2
    pcm = np.frombuffer(data, dtype=np.int16, count=n)
    samples = (pcm // 256 + 128).astype(np.uint8)  # fold back to intensity
    duration_ms = round(1000 * n / sample_rate) if sample_rate else 0
    return MediaInfo("wav", 0, 0, 1, sample_rate, duration_ms, riff_size + 8, samples)


# -- Y4M (YUV4MPEG2, C420) ---------------------------------------------------


def _y4m_frame_bytes(width: int, height: int) -> int:
    return 6 + width * height + 2 * ((width // 2) * (height // 2))  # b"FRAME\n" + planes


def encode_y4m(width: int, height: int, n_frames: int, content: bytes) -> bytes:
    if width % 2 or height % 2:
        raise ValueError("C420 needs even dimensions")
    head = Y4M_MAGIC + f"W{width} H{height} F{Y4M_FPS}:1 C420".encode() + b"\n"
    plane = width * height + 2 * ((width // 2) * (height // 2))
    out = [head]
    for i in range(n_frames):
        out.append(b"FRAME\n")
        out.append(_tile(content[i:] or content, plane).tobytes())
    return b"".join(out)


def decode_y4m(payload: bytes) -> MediaInfo:
    if not payload.startswith(Y4M_MAGIC):
        raise ValueError("not a Y4M payload")
    nl = payload.index(b"\n")
    width = height = 0
    for tok in payload[len(Y4M_MAGIC) : nl].split(b" "):
        if tok[:1] == b"W":
            width = int(tok[1:])
        elif tok[:1] == b"H":
            height = int(tok[1:])
    frame = _y4m_frame_bytes(width, height)
    n_frames = (len(payload) - nl - 1) // frame
    # Y (luma) plane of the first frame
    y0 = nl + 1 + 6
    samples = np.frombuffer(payload, dtype=np.uint8, offset=y0, count=width * height)
    duration_ms = n_frames * (1000 // Y4M_FPS)
    return MediaInfo(
        "y4m", width, height, n_frames, 0, duration_ms, nl + 1 + n_frames * frame, samples
    )


# -- dispatch ----------------------------------------------------------------


def decode_media(payload: bytes) -> MediaInfo | None:
    """Sniff the magic and parse; None for unrecognized/empty payloads."""
    if not payload:
        return None
    try:
        if payload[:2] == b"BM":
            return decode_bmp(payload)
        if payload[:4] == b"RIFF":
            return decode_wav(payload)
        if payload[:10] == Y4M_MAGIC:
            return decode_y4m(payload)
    except (ValueError, struct.error):
        return None
    return None


def intensity_histogram(samples: np.ndarray, bins: int = 16) -> list[float]:
    """Normalized intensity histogram over decoded uint8 samples — the
    deterministic feature vector fed to similarity search."""
    if samples.size == 0:
        return [0.0] * bins
    counts = np.bincount(samples >> 4, minlength=bins)[:bins]
    return (counts / samples.size).astype(float).tolist()


def resize_bmp(payload: bytes, new_width: int, new_height: int) -> bytes:
    """Nearest-neighbor resize of a 24-bit BMP, pure numpy.

    Rows are unpacked respecting the 4-byte stride padding, sampled with
    the exact integer map ``src_idx = (dst_idx * src_len) // dst_len``
    (floor arithmetic — no float coordinate math, so every engine/OS
    produces identical bytes), and re-encoded with the same header layout
    ``encode_bmp`` writes.  The standard image-pipeline preprocessing step
    (thumbnail / model-input normalization) with zero library
    dependencies."""
    if new_width <= 0 or new_height <= 0:
        raise ValueError("resize dimensions must be positive")
    info = decode_bmp(payload)
    stride = (3 * info.width + 3) // 4 * 4
    plane = info.samples[: stride * info.height].reshape(info.height, stride)
    pix = plane[:, : 3 * info.width].reshape(info.height, info.width, 3)
    # decode_bmp abs()'s biHeight; a negative raw value means a top-down BMP
    # (rows stored first-row-first).  The output is always encoded bottom-up,
    # so flip such sources into bottom-up row order to preserve orientation.
    raw_height = struct.unpack_from("<i", payload, 22)[0]
    if raw_height < 0:
        pix = pix[::-1]
    yi = (np.arange(new_height) * info.height) // new_height
    xi = (np.arange(new_width) * info.width) // new_width
    out = pix[yi][:, xi]  # (new_h, new_w, 3)
    new_stride = (3 * new_width + 3) // 4 * 4
    padded = np.zeros((new_height, new_stride), dtype=np.uint8)
    padded[:, : 3 * new_width] = out.reshape(new_height, 3 * new_width)
    row = new_stride
    size = 54 + row * new_height
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", size, 0, 0, 54,
        40, new_width, new_height, 1, 24,
        0, row * new_height, 2835, 2835, 0, 0,
    )
    return header + padded.tobytes()


def y4m_frame_luma(payload: bytes, frame_idx: int) -> np.ndarray:
    """Y (luma) plane of frame `frame_idx` — the per-frame complement of
    decode_y4m (which surfaces only frame 0).  Raises on malformed
    payloads or an out-of-range index; pure byte arithmetic, no state."""
    if not payload.startswith(Y4M_MAGIC):
        raise ValueError("not a Y4M payload")
    nl = payload.index(b"\n")
    width = height = 0
    for tok in payload[len(Y4M_MAGIC) : nl].split(b" "):
        if tok[:1] == b"W":
            width = int(tok[1:])
        elif tok[:1] == b"H":
            height = int(tok[1:])
    frame = _y4m_frame_bytes(width, height)
    n_frames = (len(payload) - nl - 1) // frame
    if not 0 <= frame_idx < n_frames:
        raise ValueError(f"frame {frame_idx} out of range 0..{n_frames - 1}")
    y0 = nl + 1 + frame_idx * frame + 6  # skip b"FRAME\n"
    return np.frombuffer(payload, dtype=np.uint8, offset=y0, count=width * height)
