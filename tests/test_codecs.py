"""PNG / WAV codecs (util/codecs.py): exact round-trips, all five PNG
scanline filters, and the real-decode multimodal stages."""

import struct
import zlib

import numpy as np
import pytest

from lucene_ray.util.codecs import png_decode, png_encode, wav_decode, wav_encode


def test_png_roundtrip_gray():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(23, 17), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(img)), img)


def test_png_roundtrip_rgb():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(9, 31, 3), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(img)), img)


def _forward_filter(img: np.ndarray, flt: int) -> bytes:
    """Apply one PNG filter to every scanline (encoder side, spec §6)."""
    h, w = img.shape
    out = bytearray()
    prev = np.zeros(w, dtype=np.int16)
    for y in range(h):
        row = img[y].astype(np.int16)
        out.append(flt)
        for x in range(w):
            a = int(row[x - 1]) if x >= 1 else 0
            b = int(prev[x])
            c = int(prev[x - 1]) if x >= 1 else 0
            if flt == 0:
                v = row[x]
            elif flt == 1:
                v = row[x] - a
            elif flt == 2:
                v = row[x] - b
            elif flt == 3:
                v = row[x] - (a + b) // 2
            else:
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else \
                    (b if pb <= pc else c)
                v = row[x] - pred
            out.append(int(v) & 0xFF)
        prev = img[y].astype(np.int16)
    return bytes(out)


@pytest.mark.parametrize("flt", [0, 1, 2, 3, 4])
def test_png_all_filters_decode(flt):
    """Hand-built PNG with every filter type decodes to the raw pixels."""
    rng = np.random.default_rng(flt + 10)
    img = rng.integers(0, 256, size=(6, 11), dtype=np.uint8)
    scan = _forward_filter(img, flt)

    def chunk(tag, data):
        crc = zlib.crc32(tag + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + tag + data + \
            struct.pack(">I", crc)

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 11, 6, 8, 0, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(scan))
           + chunk(b"IEND", b""))
    assert np.array_equal(png_decode(png), img)


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        png_decode(b"not a png at all")


def test_wav_roundtrip():
    rng = np.random.default_rng(3)
    samples = rng.integers(-32768, 32768, size=777, dtype=np.int16)
    out, rate = wav_decode(wav_encode(samples, rate=22050))
    assert rate == 22050
    assert np.array_equal(out, samples)


def test_media_real_decode_stages(ray_session):
    """The multimodal stages really decode: pipeline output equals an
    independent numpy recomputation from the closed-form generators."""
    from lucene_ray.pipelines.multimodal import (
        IMG_H,
        IMG_W,
        WAV_N,
        media_audio_sample_stats,
        media_image_pixel_stats,
    )

    sf = "/root/testdata/sf0.001"
    img = media_image_pixel_stats(sf).to_pandas().sort_values("doc_id")
    x = np.arange(IMG_W)[None, :]
    y = np.arange(IMG_H)[:, None]
    for _, row in img.head(20).iterrows():
        px = (int(row.doc_id) * 3 + x + 2 * y) % 256
        assert row.n_pixels == IMG_W * IMG_H
        assert row.mean_pixel == px.sum() / px.size
        assert row.max_pixel == px.max()

    wav = media_audio_sample_stats(sf).to_pandas().sort_values("doc_id")
    i = np.arange(WAV_N, dtype=np.int64)
    for _, row in wav.head(20).iterrows():
        s = np.abs((int(row.doc_id) * 7 + i * 13) % 65536 - 32768)
        assert row.n_samples == WAV_N
        assert row.mean_abs == s.sum() / WAV_N
        assert row.peak == s.max()
