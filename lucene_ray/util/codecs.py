"""Pure-stdlib media codecs: PNG (zlib inflate + scanline unfilter, from
the public PNG specification, RFC 2083) and WAV PCM (stdlib `wave`).

The container ships no PIL/pyav/cv2, but PNG and WAV need only zlib and
numpy — so the multimodal pipeline's decode stage is REAL for these two
formats (bytes in Arrow binary columns -> pixel/sample arrays), with the
other codecs (JPEG, video) remaining documented stubs.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_encode(arr: np.ndarray) -> bytes:
    """Encode uint8 HxW (grayscale) or HxWx3 (RGB) as a PNG (filter 0)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color_type, channels = 0, 1
        h, w = arr.shape
    elif arr.ndim == 3 and arr.shape[2] == 3:
        color_type, channels = 2, 3
        h, w = arr.shape[:2]
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    raw = arr.reshape(h, w * channels)
    scanlines = np.concatenate(
        (np.zeros((h, 1), dtype=np.uint8), raw), axis=1).tobytes()

    def chunk(tag: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(tag + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + tag + data + \
            struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(scanlines))
            + chunk(b"IEND", b""))


def _unfilter(flt: int, row: np.ndarray, prev: np.ndarray,
              bpp: int) -> np.ndarray:
    """Undo one scanline filter (PNG spec §6); returns the recon row."""
    if flt == 0:                                    # None
        return row
    if flt == 2:                                    # Up
        return (row.astype(np.int16) + prev).astype(np.uint8)
    out = np.empty_like(row)
    n = len(row)
    if flt == 1:                                    # Sub
        out[:bpp] = row[:bpp]
        for x in range(bpp, n):
            out[x] = (int(row[x]) + int(out[x - bpp])) & 0xFF
        return out
    if flt == 3:                                    # Average
        for x in range(n):
            a = int(out[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            out[x] = (int(row[x]) + (a + b) // 2) & 0xFF
        return out
    if flt == 4:                                    # Paeth
        for x in range(n):
            a = int(out[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            p = a + b - c
            pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
            out[x] = (int(row[x]) + pred) & 0xFF
        return out
    raise ValueError(f"unknown PNG filter {flt}")


def png_decode(data: bytes) -> np.ndarray:
    """Decode an 8-bit grayscale / RGB non-interlaced PNG to a uint8 array
    (HxW or HxWx3).  Raises ValueError on anything outside that subset."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    width = height = None
    color_type = channels = None
    idat = []
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        crc_stored = struct.unpack(
            ">I", data[pos + 8 + length:pos + 12 + length])[0]
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc_stored:
            raise ValueError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
                raise ValueError("unsupported PNG variant")
            channels = {0: 1, 2: 3}.get(color_type)
            if channels is None:
                raise ValueError(f"unsupported color type {color_type}")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("truncated PNG")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = width * channels
    raw = raw.reshape(height, stride + 1)
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        prev = _unfilter(int(raw[y, 0]), raw[y, 1:], prev, channels)
        out[y] = prev
    return out if channels == 1 else out.reshape(height, width, 3)


def wav_encode(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Encode mono int16 PCM samples as a WAV file."""
    samples = np.asarray(samples, dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.tobytes())
    return buf.getvalue()


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a mono 16-bit PCM WAV to (int16 samples, sample rate)."""
    with wave.open(io.BytesIO(data), "rb") as f:
        if f.getsampwidth() != 2 or f.getnchannels() != 1:
            raise ValueError("only mono 16-bit PCM supported")
        rate = f.getframerate()
        frames = f.readframes(f.getnframes())
    return np.frombuffer(frames, dtype=np.int16), rate
