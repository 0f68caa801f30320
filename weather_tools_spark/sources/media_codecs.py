"""Stdlib media codecs: BMP (24-bit) images, WAV (PCM16) audio, and a
raw-frame video container — struct + numpy only, no media libraries.

These give the multimodal column family a REAL decode path (the same
strategy as the stdlib weather codecs in netcdf3/grib2/geotiff/hdf5):
the bytes in the ``content`` binary column are genuine file formats any
external tool can open, and decode/resize/frame-sample operate on real
pixels/samples instead of the hash-fake.

Formats:

- BMP: BITMAPFILEHEADER (14 B) + BITMAPINFOHEADER (40 B), 24 bpp BGR,
  rows padded to 4-byte multiples, bottom-up row order — the baseline
  layout every viewer reads.
- WAV: RIFF/WAVE with ``fmt `` (PCM, 16-bit) + ``data`` chunks, mono or
  interleaved stereo.
- RVID: a deliberately minimal raw-video container for the frame-sample
  operator — magic ``RVID`` + u16 width/height + u16 fps + u32 n_frames,
  then n_frames raw RGB24 frames (no padding). Video containers proper
  (mp4/mkv) genuinely need external demuxers and stay behind the decode
  gate; RVID makes the *operator* (slice Nth frame without touching the
  rest) real and testable on real bytes.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# BMP (24-bit uncompressed)
# --------------------------------------------------------------------------


def bmp_encode(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bpp BMP bytes (BGR, bottom-up, padded)."""
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB array")
    h, w, _ = rgb.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    img_size = stride * h
    # BGR channel order, bottom-up row order.
    bgr = rgb[::-1, :, ::-1].astype(np.uint8)
    if pad:
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
        body = rows.tobytes()
    else:
        body = bgr.tobytes()
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + img_size, 0, 0, offset)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    return header + info + body


def bmp_decode(data: bytes) -> np.ndarray:
    """BMP bytes -> (h, w, 3) uint8 RGB. Supports the 24-bpp
    uncompressed BITMAPINFOHEADER layout (top-down via negative height
    also accepted, as the format allows)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP file")
    offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h_raw = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    top_down = h_raw < 0
    h = abs(h_raw)
    stride = (w * 3 + 3) // 4 * 4
    body = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=offset)
    rows = body.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def image_resize_nearest(rgb: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbor resample to (th, tw): source index floor(i*sh/th)
    — the exact mapping the oracle SQL replays (no rounding ties)."""
    sh, sw, _ = rgb.shape
    ys = (np.arange(th) * sh) // th
    xs = (np.arange(tw) * sw) // tw
    return rgb[ys][:, xs]


# --------------------------------------------------------------------------
# WAV (PCM 16-bit)
# --------------------------------------------------------------------------


def wav_encode(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n,) or (n, channels) int16 -> RIFF/WAVE PCM16 bytes."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n, ch = s.shape
    data = s.tobytes()  # interleaved by construction (row-major)
    byte_rate = sample_rate * ch * 2
    block_align = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, block_align, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((n, channels) int16 array, sample_rate). Walks the
    RIFF chunk list, so extra chunks (LIST/INFO) are skipped correctly."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    ch = rate = None
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = pos + 8
        if cid == b"fmt ":
            audio_fmt, ch, rate = struct.unpack_from("<HHI", data, body)
            bits = struct.unpack_from("<H", data, body + 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV: fmt={audio_fmt} bits={bits}")
        elif cid == b"data":
            if ch is None:
                raise ValueError("WAV data chunk before fmt chunk")
            raw = np.frombuffer(data, dtype="<i2", count=size // 2, offset=body)
            samples = raw.reshape(-1, ch)
        pos = body + size + (size % 2)  # chunks are word-aligned
    if samples is None or rate is None:
        raise ValueError("WAV missing fmt/data chunk")
    return samples, rate


# --------------------------------------------------------------------------
# RVID raw-frame video
# --------------------------------------------------------------------------

_RVID_MAGIC = b"RVID"
_RVID_HEADER = struct.Struct("<4sHHHI")  # magic, w, h, fps, n_frames


def rvid_encode(frames: np.ndarray, fps: int = 10) -> bytes:
    """(n_frames, h, w, 3) uint8 RGB -> RVID bytes."""
    n, h, w, _ = frames.shape
    return _RVID_HEADER.pack(_RVID_MAGIC, w, h, fps, n) + np.ascontiguousarray(
        frames, dtype=np.uint8
    ).tobytes()


def rvid_info(data: bytes) -> tuple[int, int, int, int]:
    """-> (width, height, fps, n_frames) without touching frame bytes."""
    magic, w, h, fps, n = _RVID_HEADER.unpack_from(data, 0)
    if magic != _RVID_MAGIC:
        raise ValueError("not an RVID stream")
    return w, h, fps, n


def rvid_frame(data: bytes, idx: int) -> np.ndarray:
    """Decode frame ``idx`` ONLY — a byte-range slice, so sampling every
    Nth frame of a long video reads n/N frames' bytes, not all of them."""
    w, h, _fps, n = rvid_info(data)
    if not 0 <= idx < n:
        raise IndexError(f"frame {idx} out of range 0..{n - 1}")
    fsz = w * h * 3
    off = _RVID_HEADER.size + idx * fsz
    return (
        np.frombuffer(data, dtype=np.uint8, count=fsz, offset=off)
        .reshape(h, w, 3)
        .copy()
    )


def sniff_media(data: bytes) -> str:
    """Magic-byte detection for the multimodal decode dispatch."""
    if data[:2] == b"BM":
        return "bmp"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:4] == _RVID_MAGIC:
        return "rvid"
    return "unknown"
