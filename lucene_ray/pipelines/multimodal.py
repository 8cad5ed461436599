"""Multimodal-column plumbing: opaque binary payloads + actor-pool feature
extraction.

Round 5: the decode step is REAL for PNG images and WAV audio —
`util/codecs.py` implements both from their public specs with only
zlib/wave/numpy (`media_image_pixel_stats` / `media_audio_sample_stats`
synthesize real PNG/WAV bytes into Arrow binary columns and the actor
pool genuinely decodes them; both carry SQL-exact oracles because the
synthesized content has a closed form).  JPEG/video decode remains a
clearly-marked deterministic STUB (no codec libs in this container) — the
Ray-side plumbing is identical either way: binary payloads live in Arrow
`binary` columns (never converted to pandas object dtype), the extractor
is a callable CLASS run as a `map_batches` actor pool (model "loaded"
once per actor in __init__), batches are kept small because rows are
wide.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

FEAT_DIM = 16


def _attach_payload(batch: pa.Table) -> pa.Table:
    """Deterministic fake media payload per document (stands in for an
    image/audio blob column read from parquet)."""
    payload = pa.array([t.encode() if t else b"" for t in
                        batch.column("text").to_pylist()], type=pa.binary())
    return pa.table({"doc_id": batch.column("doc_id"), "payload": payload})


class FeatureExtractor:
    """Actor-pool stage: 'model' built once per actor, per-batch vectorized
    extraction.  decode() is the stub boundary — swap it for a real decoder
    (PIL/torchaudio/...) when the libs exist."""

    def __init__(self, dim: int = FEAT_DIM, seed: int = 1234):
        # model load happens ONCE per actor (amortized across batches)
        rng = np.random.default_rng(seed)
        self.proj = rng.normal(size=(256, dim))

    @staticmethod
    def decode(payload: bytes) -> np.ndarray:
        """STUB decoder: real implementation would decode image/audio bytes.
        Deterministic fake: byte histogram (raises nothing; a real decoder
        would raise NotImplementedError for unsupported codecs)."""
        arr = np.frombuffer(payload, dtype=np.uint8)
        hist = np.bincount(arr, minlength=256).astype(np.float64)
        return hist

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = np.stack([self.decode(p) @ self.proj for p in payloads]) \
            if payloads else np.zeros((0, self.proj.shape[1]))
        md5s = [hashlib.md5(p).hexdigest() for p in payloads]
        n_bytes = pa.compute.cast(
            pa.compute.binary_length(batch.column("payload")), pa.int64())
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_bytes": n_bytes,
            "payload_md5": pa.array(md5s, type=pa.string()),
            "feat": pa.array([row.tolist() for row in feats],
                             type=pa.list_(pa.float64())),
        })


def media_features(sf_dir: str, concurrency: int = 2):
    """documents -> binary payload -> actor-pool feature extraction."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return (ds.map_batches(_attach_payload, batch_format="pyarrow")
            .map_batches(FeatureExtractor, batch_format="pyarrow",
                         batch_size=256, concurrency=concurrency, num_cpus=1))


def media_features_table(sf_dir: str):
    """SQL-checkable projection of the actor-pool output (drops the stub
    feature vector, keeps the exact columns DuckDB can mirror)."""
    ds = media_features(sf_dir)
    return ds.map_batches(lambda t: t.select(["doc_id", "n_bytes", "payload_md5"]),
                          batch_format="pyarrow")


FRAME_BYTES = 64           # stub "frame" size: payload = sequence of frames
FRAME_STRIDE = 4           # sample every 4th frame


class ImageResizer:
    """Actor-pool resize stage (decode -> resize -> re-encode shape).  The
    decode is the same stub boundary; the resize itself is real vectorized
    numpy (area downsampling to `target` x `target`)."""

    def __init__(self, target: int = 8):
        self.target = target

    @staticmethod
    def decode_image(payload: bytes) -> np.ndarray:
        """STUB: a real decoder (PIL) would produce HxW pixels; the fake is
        a deterministic 16x16 'image' tiled from the payload bytes."""
        arr = np.frombuffer(payload, dtype=np.uint8)
        need = 16 * 16
        if len(arr) == 0:
            arr = np.zeros(need, dtype=np.uint8)
        reps = -(-need // len(arr))
        return np.tile(arr, reps)[:need].reshape(16, 16)

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = self.target
        out_md5, out_mean = [], []
        for p in batch.column("payload").to_pylist():
            img = self.decode_image(p).astype(np.float64)
            # area resize 16x16 -> t x t (block mean)
            f = 16 // t
            small = img.reshape(t, f, t, f).mean(axis=(1, 3))
            q = np.clip(np.round(small), 0, 255).astype(np.uint8)
            out_md5.append(hashlib.md5(q.tobytes()).hexdigest())
            out_mean.append(float(small.mean()))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "width": pa.array([t] * len(out_md5), type=pa.int64()),
            "height": pa.array([t] * len(out_md5), type=pa.int64()),
            "resized_md5": pa.array(out_md5, type=pa.string()),
            "mean_px": pa.array(out_mean, type=pa.float64()),
        })


class FrameSampler:
    """Actor-pool frame-sampling stage: the payload is treated as a sequence
    of FRAME_BYTES-sized frames (the stub stand-in for video packets); every
    FRAME_STRIDE-th frame is kept.  Counting semantics are exact and
    SQL-mirrorable on octet_length."""

    def __init__(self, frame_bytes: int = FRAME_BYTES, stride: int = FRAME_STRIDE):
        self.frame_bytes = frame_bytes
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        fb, st = self.frame_bytes, self.stride
        n_frames, n_sampled, smd5 = [], [], []
        for p in batch.column("payload").to_pylist():
            nf = -(-len(p) // fb) if p else 0
            idxs = list(range(0, nf, st))
            n_frames.append(nf)
            n_sampled.append(len(idxs))
            sampled = b"".join(p[i * fb:(i + 1) * fb] for i in idxs)
            smd5.append(hashlib.md5(sampled).hexdigest())
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_frames": pa.array(n_frames, type=pa.int64()),
            "n_sampled": pa.array(n_sampled, type=pa.int64()),
            "sample_md5": pa.array(smd5, type=pa.string()),
        })


def media_frames(sf_dir: str, concurrency: int = 2):
    """documents -> payload -> frame sampling (actor pool); the counting
    columns are SQL-checkable via octet_length."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return (ds.map_batches(_attach_payload, batch_format="pyarrow")
            .map_batches(FrameSampler, batch_format="pyarrow",
                         batch_size=256, concurrency=concurrency, num_cpus=1)
            .map_batches(lambda t: t.select(["doc_id", "n_frames", "n_sampled"]),
                         batch_format="pyarrow"))


def media_resize(sf_dir: str, concurrency: int = 2):
    """documents -> payload -> decode+resize (actor pool)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return (ds.map_batches(_attach_payload, batch_format="pyarrow")
            .map_batches(ImageResizer, batch_format="pyarrow",
                         batch_size=256, concurrency=concurrency, num_cpus=1))


# ---------------------------------------------------------------------------
# REAL decode paths (round 5): PNG + WAV via util/codecs.py
# ---------------------------------------------------------------------------

IMG_W, IMG_H = 16, 12
WAV_N = 256


def _attach_png(batch: pa.Table) -> pa.Table:
    """Real PNG payload per doc: pixel[y,x] = (doc_id*3 + x + 2y) mod 256
    (closed form, so the decoded stats have an exact SQL twin)."""
    from ..util.codecs import png_encode

    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    x = np.arange(IMG_W)[None, :]
    y = np.arange(IMG_H)[:, None]
    payloads = [png_encode(((int(d) * 3 + x + 2 * y) % 256).astype(np.uint8))
                for d in ids]
    return pa.table({"doc_id": batch.column("doc_id"),
                     "payload": pa.array(payloads, type=pa.binary())})


class PngPixelStats:
    """Actor-pool stage that REALLY decodes PNG bytes (zlib inflate +
    scanline unfilter) and emits exact pixel statistics."""

    def __init__(self):
        from ..util.codecs import png_decode

        self.decode = png_decode            # bound once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_px, mean_px, max_px = [], [], []
        for p in batch.column("payload").to_pylist():
            img = self.decode(p)
            n = img.size
            n_px.append(n)
            mean_px.append(float(img.sum(dtype=np.float64)) / n)
            max_px.append(int(img.max()))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_pixels": pa.array(n_px, type=pa.int64()),
            "mean_pixel": pa.array(mean_px, type=pa.float64()),
            "max_pixel": pa.array(max_px, type=pa.int64()),
        })


def media_image_pixel_stats(sf_dir: str, concurrency: int = 2):
    """documents -> real PNG payloads -> actor-pool decode -> pixel stats
    (SQL-exact against the generator's closed form)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return (ds.map_batches(_attach_png, batch_format="pyarrow")
            .map_batches(PngPixelStats, batch_format="pyarrow",
                         batch_size=256, concurrency=concurrency, num_cpus=1))


def media_image_pixel_stats_sql() -> str:
    return f"""
SELECT d.doc_id,
       {IMG_W * IMG_H}::BIGINT AS n_pixels,
       avg(((d.doc_id * 3 + x.x + 2 * y.y) % 256)::DOUBLE) AS mean_pixel,
       max((d.doc_id * 3 + x.x + 2 * y.y) % 256)::BIGINT AS max_pixel
FROM documents d, range({IMG_W}) x(x), range({IMG_H}) y(y)
GROUP BY d.doc_id
ORDER BY d.doc_id
"""


def _attach_wav(batch: pa.Table) -> pa.Table:
    """Real WAV payload per doc: sample[i] = ((doc_id*7 + i*13) mod 65536)
    - 32768 as int16 PCM."""
    from ..util.codecs import wav_encode

    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    i = np.arange(WAV_N, dtype=np.int64)
    payloads = [wav_encode((((int(d) * 7 + i * 13) % 65536) - 32768)
                           .astype(np.int16)) for d in ids]
    return pa.table({"doc_id": batch.column("doc_id"),
                     "payload": pa.array(payloads, type=pa.binary())})


class WavSampleStats:
    """Actor-pool stage that decodes WAV PCM (stdlib wave) and emits exact
    sample statistics."""

    def __init__(self):
        from ..util.codecs import wav_decode

        self.decode = wav_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_s, mean_abs, peak = [], [], []
        for p in batch.column("payload").to_pylist():
            samples, _rate = self.decode(p)
            s = samples.astype(np.int64)
            n_s.append(len(s))
            mean_abs.append(float(np.abs(s).sum()) / len(s))
            peak.append(int(np.abs(s).max()))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_samples": pa.array(n_s, type=pa.int64()),
            "mean_abs": pa.array(mean_abs, type=pa.float64()),
            "peak": pa.array(peak, type=pa.int64()),
        })


def media_audio_sample_stats(sf_dir: str, concurrency: int = 2):
    """documents -> real WAV payloads -> actor-pool decode -> sample stats
    (SQL-exact against the generator's closed form)."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    return (ds.map_batches(_attach_wav, batch_format="pyarrow")
            .map_batches(WavSampleStats, batch_format="pyarrow",
                         batch_size=256, concurrency=concurrency, num_cpus=1))


def media_audio_sample_stats_sql() -> str:
    return f"""
SELECT d.doc_id,
       {WAV_N}::BIGINT AS n_samples,
       avg(abs((d.doc_id * 7 + i.i * 13) % 65536 - 32768)::DOUBLE)
           AS mean_abs,
       max(abs((d.doc_id * 7 + i.i * 13) % 65536 - 32768))::BIGINT AS peak
FROM documents d, range({WAV_N}) i(i)
GROUP BY d.doc_id
ORDER BY d.doc_id
"""
