"""Pure-numpy media codecs for the multimodal pipeline.

The container has no PIL/torchaudio/ffmpeg, but that only rules out *complex*
codecs — simple container formats are just headers + arrays, and decoding
them needs nothing beyond numpy:

 * WAV  — RIFF container, 16-bit PCM mono (the canonical 44-byte header plus
   proper chunk walking on decode, so files with extra chunks — LIST/fact —
   still parse).
 * BMP  — BITMAPFILEHEADER + BITMAPINFOHEADER, uncompressed 24-bit BI_RGB,
   bottom-up rows, 4-byte row stride padding (the parts naive parsers get
   wrong).
 * RVID — a minimal raw-video container defined HERE (magic ``RVID`` + width
   + height + frame count + concatenated raw RGB frames). Real video codecs
   (H.264 etc.) genuinely require ffmpeg, which this sandbox lacks; RVID
   keeps the *pipeline* real — header parsing, frame seeking, 1->N frame
   explosion over Arrow batches — with an honest, documented container
   instead of a NotImplementedError stub.

Everything operates on ``bytes`` in / ``bytes`` out so the functions drop
straight into Arrow-batched pandas UDFs. Encoders exist so synthetic test
corpora are *valid media files*, making the decode path a real contract
(decode(encode(x)) == x is property-tested in tests/test_media_codecs.py).
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------- WAV


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """16-bit PCM mono WAV: canonical 44-byte RIFF/WAVE/fmt/data layout."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                sample_rate * 2, 2, 16)
        + b"data" + struct.pack("<I", len(pcm))
    )
    return hdr + pcm


def decode_wav(b: bytes) -> tuple[int, np.ndarray]:
    """-> (sample_rate, int16 samples). Walks RIFF chunks (not a fixed-offset
    read): tolerates extra chunks between fmt and data, validates PCM16 mono."""
    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, bits, channels, data = 12, None, None, None, None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        if pos + 8 + size > len(b):
            # a Python slice would silently truncate here and the chunk
            # parses below would misread or raise struct.error — at corpus
            # scale truncated/chopped files are certain, fail loudly instead
            raise ValueError(
                f"truncated RIFF chunk {cid!r}: declares {size} bytes, "
                f"only {len(b) - pos - 8} remain")
        body = b[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError(f"WAV fmt chunk too short ({size} bytes, want >=16)")
            fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if fmt != 1:
                raise ValueError(f"unsupported WAV audio format {fmt} (want PCM)")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    if bits != 16 or channels != 1:
        raise ValueError(f"unsupported WAV layout: {bits}-bit, {channels}ch (want 16-bit mono)")
    if len(data) % 2:
        raise ValueError("PCM16 data chunk has odd byte length")
    return rate, np.frombuffer(data, dtype="<i2")


# --------------------------------------------------------------------- BMP


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> uncompressed 24-bit BI_RGB BMP (bottom-up rows,
    BGR byte order, stride padded to 4 bytes — the on-disk conventions)."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, RGB->BGR
    body = rows.tobytes()
    file_hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + len(body), 0, 0, 54)
    info_hdr = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                           2835, 2835, 0, 0)
    return file_hdr + info_hdr + body


def decode_bmp(b: bytes) -> np.ndarray:
    """-> (h, w, 3) uint8 RGB. Parses both headers, honors the pixel-data
    offset, row stride padding, bottom-up row order and BGR byte order."""
    if len(b) < 54 or b[0:2] != b"BM":
        raise ValueError("not a BMP file")
    (offset,) = struct.unpack_from("<I", b, 10)
    hdr_size, w, h = struct.unpack_from("<Iii", b, 14)
    planes, bpp = struct.unpack_from("<HH", b, 26)
    (compression,) = struct.unpack_from("<I", b, 30)
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: header={hdr_size} bpp={bpp} comp={compression}")
    if w <= 0 or h == 0:
        # width/height are SIGNED int32 (negative h = top-down rows is valid;
        # negative/zero w is not) — without this check a hostile width yields
        # a negative stride and a negative frombuffer count, which numpy
        # interprets as "whole buffer" before failing on reshape
        raise ValueError(f"invalid BMP dimensions {w}x{h}")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    if offset < 14 + hdr_size or offset + h * stride > len(b):
        raise ValueError(
            f"BMP pixel data out of bounds: offset={offset}, "
            f"need {h * stride} bytes, file has {len(b)}")
    raw = np.frombuffer(b, dtype=np.uint8, count=h * stride, offset=offset)
    rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


# -------------------------------------------------------------------- RVID

RVID_MAGIC = b"RVID"
RVID_HEADER = 12  # magic(4) + w(2) + h(2) + n_frames(4)


def encode_rvid(frames: np.ndarray) -> bytes:
    """(n, h, w, 3) uint8 RGB frames -> RVID container."""
    fr = np.asarray(frames, dtype=np.uint8)
    n, h, w, _ = fr.shape
    return (RVID_MAGIC + struct.pack("<HHI", w, h, n) + fr.tobytes())


def decode_rvid_header(b: bytes) -> tuple[int, int, int]:
    """-> (width, height, n_frames)."""
    if len(b) < RVID_HEADER or b[0:4] != RVID_MAGIC:
        raise ValueError("not an RVID container")
    w, h, n = struct.unpack_from("<HHI", b, 4)
    if w == 0 or h == 0:
        raise ValueError(f"invalid RVID dimensions {w}x{h}")
    # n*w*h*3 cannot overflow (Python ints are arbitrary precision), so a
    # hostile n_frames=0xFFFFFFFF lands here as a clean size mismatch
    expect = RVID_HEADER + n * w * h * 3
    if len(b) < expect:
        raise ValueError(f"truncated RVID: {len(b)} bytes, header implies {expect}")
    return w, h, n


def decode_rvid_frame(b: bytes, frame_no: int) -> np.ndarray:
    """Seek + decode ONE frame -> (h, w, 3) uint8 RGB (no full-file decode —
    the access pattern keyframe sampling needs)."""
    w, h, n = decode_rvid_header(b)
    if not 0 <= frame_no < n:
        raise IndexError(f"frame {frame_no} out of range 0..{n - 1}")
    fsz = w * h * 3
    off = RVID_HEADER + frame_no * fsz
    return np.frombuffer(b, dtype=np.uint8, count=fsz, offset=off).reshape(h, w, 3).copy()


# ------------------------------------------------------------- transforms


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy index math (deterministic, no
    interpolation-library dependence)."""
    h, w = img.shape[:2]
    ri = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    ci = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ri][:, ci]


def resample_linear(samples: np.ndarray, n_out: int) -> np.ndarray:
    """Linear-interpolation resample of a 1-D signal to n_out points."""
    s = np.asarray(samples, dtype=np.float64)
    if s.size == 0:
        return np.zeros(n_out)
    if s.size == 1:
        return np.full(n_out, float(s[0]))
    x_out = np.linspace(0.0, s.size - 1, n_out)
    return np.interp(x_out, np.arange(s.size), s)


def binned_means(x: np.ndarray, n_bins: int) -> np.ndarray:
    """Mean per contiguous bin -> float32 feature of fixed length."""
    x = np.asarray(x, dtype=np.float32).ravel()
    if x.size == 0:
        return np.zeros(n_bins, dtype=np.float32)
    chunks = np.array_split(x, n_bins)
    return np.array([c.mean() if c.size else 0.0 for c in chunks], dtype=np.float32)
