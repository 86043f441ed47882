"""Stdlib-only real media codecs: BMP (struct + numpy) and WAV (wave).

This container has no image/audio libraries, but two real, widely-used
formats are parseable with nothing beyond the standard library and numpy —
which retires the repo's one remaining stub (the codec boundary in
operators/multimodal.py) for those formats while keeping the honest
``NotImplementedError`` for genuinely unsupported ones (PNG/JPEG/MP4 need
external decoders).

Scope: BMP 24/32-bit uncompressed (BI_RGB), bottom-up and top-down row
order, 4-byte row padding; WAV 16-bit PCM mono/stereo via stdlib ``wave``.
Encoders emit canonical forms (24-bit bottom-up BMP, 16-bit PCM WAV), so
encode→decode round-trips are exact — the determinism the distributed
pipeline tests rely on.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

# -- sniffing ------------------------------------------------------------------


def sniff_media(payload: bytes) -> str | None:
    """Detect a payload's container from magic bytes: 'bmp', 'wav', or None."""
    if payload[:2] == b"BM" and len(payload) >= 54:
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return None


# -- BMP -----------------------------------------------------------------------

_BMP_FILE_HEADER = "<2sIHHI"   # magic, file size, reserved x2, pixel offset
_BMP_INFO_HEADER = "<IiiHHIIiiII"  # BITMAPINFOHEADER (40 bytes)


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit uncompressed BMP
    (bottom-up, BGR byte order, rows padded to 4 bytes — the canonical
    layout every BMP reader accepts)."""
    img = np.asarray(img)
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_bmp expects an (h, w, 3) uint8 array")
    h, w = img.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    pad = row_bytes - w * 3
    # RGB -> BGR, bottom-up row order, per-row padding
    bgr = img[::-1, :, ::-1]
    rows = bgr.reshape(h, w * 3)
    if pad:
        rows = np.hstack([rows, np.zeros((h, pad), dtype=np.uint8)])
    pixel_data = rows.tobytes()
    info = struct.pack(_BMP_INFO_HEADER, 40, w, h, 1, 24, 0,
                       len(pixel_data), 2835, 2835, 0, 0)
    offset = 14 + 40
    header = struct.pack(_BMP_FILE_HEADER, b"BM",
                         offset + len(pixel_data), 0, 0, offset)
    return header + info + pixel_data


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24/32-bit BMP to an (h, w, 3) uint8 RGB array.

    Handles bottom-up (positive height) and top-down (negative height) row
    order and the 4-byte row padding. Raises ``ValueError`` on structures
    this decoder does not cover (palettes, RLE, bitfield masks)."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    _, _, _, _, offset = struct.unpack_from(_BMP_FILE_HEADER, payload, 0)
    (hdr_size, w, h_signed, planes, bpp, compression,
     _, _, _, _, _) = struct.unpack_from(_BMP_INFO_HEADER, payload, 14)
    if hdr_size < 40:
        raise ValueError("BMP core-header (OS/2) variant not supported")
    if compression != 0:
        raise ValueError(f"compressed BMP (type {compression}) not supported")
    if bpp not in (24, 32):
        raise ValueError(f"{bpp}-bit BMP not supported (24/32 only)")
    top_down = h_signed < 0
    h = abs(h_signed)
    channels = bpp // 8
    row_bytes = (w * channels + 3) & ~3
    need = offset + row_bytes * h
    if len(payload) < need:
        raise ValueError("truncated BMP payload")
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * h,
                         offset=offset).reshape(h, row_bytes)
    px = rows[:, : w * channels].reshape(h, w, channels)
    if not top_down:
        px = px[::-1]
    # BGR(A) -> RGB
    return np.ascontiguousarray(px[:, :, 2::-1])


# -- WAV -----------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode int16 PCM samples — shape (n,) mono or (n, ch) — as WAV."""
    samples = np.asarray(samples)
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(np.ascontiguousarray(samples).tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a 16-bit PCM WAV payload to (sample_rate, (n, ch) int16)."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise ValueError(
                f"{8 * wf.getsampwidth()}-bit WAV not supported (16-bit PCM "
                "only)")
        ch = wf.getnchannels()
        rate = wf.getframerate()
        n = wf.getnframes()
        raw = wf.readframes(n)
    data = np.frombuffer(raw, dtype="<i2").reshape(-1, ch)
    return rate, data
