"""Audio/video multimodal columns: opaque ``binary`` payloads decoded
and feature-extracted in actor-pool ``map_batches`` stages — the audio
and frame-sample legs of the multimodal story (images: stages/media.py).

- ``AudioDecoder`` — a real, dependency-free WAV (RIFF) decoder built on
  ``struct`` + numpy: PCM 16-bit and 8-bit, mono or multi-channel, with
  proper chunk walking (skips LIST/fact/etc., honors word alignment).
  Emits sample rate / channels / duration plus vectorized signal stats
  (RMS, peak, zero-crossing rate). Non-WAV or unsupported encodings
  degrade per-row to ``format='unsupported'`` — at corpus scale a decode
  stage must never fail the task.
- ``FrameSampler`` — frame sampling over a deterministic frame-concat
  video container (``FCV1``: magic + fps + frame count, then
  length-prefixed PNG frames). Real videos would be ffmpeg-decoded in an
  identical actor stage; the container here keeps the *sampling*
  semantics (uniform every-k / max-n selection, timestamps, per-frame
  decode + stats) real and testable with stdlib only. One input row
  expands to one output row per sampled frame — the expansion happens
  inside ``map_batches`` (flat Arrow output), never on the driver.

Fixture writers ``encode_wav`` / ``encode_fcv`` and deterministic
``synth_audio_table`` / ``synth_video_table`` generators let tests and
queries run on actual encoded bytes with known ground truth (a sine's
RMS is amp/sqrt(2); its zero-crossing rate is 2f/sr).

Scale notes (SURVEY.md §4.2): payloads are wide binary rows, so batches
are small (batch × concurrency must fit worker heap) and the stage is an
actor pool with decode state built once per actor (ST1).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

from .media import _decode_png, _luminance, encode_png

# --------------------------------------------------------------------------
# WAV fixture encoder + decoder
# --------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16000, *, bits: int = 16) -> bytes:
    """Minimal RIFF/WAVE PCM writer for a (n,) or (n, ch) array.
    ``bits`` 16 → int16 little-endian; 8 → unsigned 8-bit (the classic
    offset-128 layout). Float input in [-1, 1] is quantized."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    if np.issubdtype(a.dtype, np.floating):
        a = np.clip(a, -1.0, 1.0)
        if bits == 16:
            a = np.round(a * 32767.0).astype(np.int16)
        else:
            a = (np.round(a * 127.0) + 128).astype(np.uint8)
    if bits == 16:
        pcm = np.ascontiguousarray(a.astype("<i2")).tobytes()
    elif bits == 8:
        pcm = np.ascontiguousarray(a.astype(np.uint8)).tobytes()
    else:
        raise ValueError(f"unsupported bits {bits}")
    block = ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * block, block, bits)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    if len(pcm) % 2:
        body += b"\x00"  # RIFF word alignment
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_wav(data: bytes):
    """→ (sample_rate, channels, samples: (n, ch) float64 in [-1, 1])
    or None. PCM (format 1) 8/16-bit only; other encodings → None."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos = 12
    sr = ch = bits = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt " and len(body) >= 16:
            audio_fmt, ch, sr, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if audio_fmt != 1:
                return None
        elif tag == b"data":
            pcm = body
    if sr is None or pcm is None or not ch:
        return None
    if bits == 16:
        raw = np.frombuffer(pcm, dtype="<i2", count=len(pcm) // 2)
        x = raw.astype(np.float64) / 32768.0
    elif bits == 8:
        raw = np.frombuffer(pcm, dtype=np.uint8)
        x = (raw.astype(np.float64) - 128.0) / 128.0
    else:
        return None
    n = x.size // ch
    return int(sr), int(ch), x[: n * ch].reshape(n, ch)


AUDIO_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("n_bytes", pa.int64()),
        ("format", pa.string()),
        ("sample_rate", pa.int64()),
        ("channels", pa.int64()),
        ("n_samples", pa.int64()),
        ("duration_sec", pa.float64()),
        ("rms", pa.float64()),
        ("peak", pa.float64()),
        ("zero_cross_rate", pa.float64()),
        ("digest", pa.string()),
    ]
)


class AudioDecoder:
    """Real WAV decode + vectorized signal stats, per-actor state in
    ``__init__`` (ST1 — stands in for a codec/model load)."""

    def __init__(self) -> None:
        self._magic = b"RIFF"

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {name: [] for name in AUDIO_SCHEMA.names}
        urls = batch["url"].to_pylist()
        for url, payload in zip(urls, batch["payload"].to_pylist()):
            b = payload or b""
            decoded = _decode_wav(b) if b.startswith(self._magic) else None
            rows["url"].append(url)
            rows["n_bytes"].append(len(b))
            rows["digest"].append(hashlib.blake2b(b, digest_size=8).hexdigest())
            if decoded is None:
                rows["format"].append("unsupported")
                for k in ("sample_rate", "channels", "n_samples"):
                    rows[k].append(0)
                for k in ("duration_sec", "rms", "peak", "zero_cross_rate"):
                    rows[k].append(0.0)
                continue
            sr, ch, x = decoded
            mono = x.mean(axis=1)
            n = mono.size
            zc = float(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
            rows["format"].append("wav")
            rows["sample_rate"].append(sr)
            rows["channels"].append(ch)
            rows["n_samples"].append(n)
            rows["duration_sec"].append(n / sr if sr else 0.0)
            rows["rms"].append(float(np.sqrt(np.mean(np.square(x)))) if n else 0.0)
            rows["peak"].append(float(np.max(np.abs(x))) if n else 0.0)
            rows["zero_cross_rate"].append(zc / (n - 1) if n > 1 else 0.0)
        return pa.table(rows, schema=AUDIO_SCHEMA)


def synth_audio_table(n: int, *, seed: int = 11) -> pa.Table:
    """Deterministic (url, payload) WAV fixture: sine tones with varied
    frequency/amplitude/rate, mono and stereo, 16- and 8-bit, plus one
    non-audio payload per 10 rows."""
    rng = np.random.default_rng(seed)
    urls, payloads = [], []
    for i in range(n):
        sr = (8000, 16000, 22050)[i % 3]
        dur = 0.05 + float(rng.integers(0, 10)) / 100.0
        freq = 200.0 + float(rng.integers(0, 1800))
        amp = 0.2 + float(rng.integers(0, 7)) / 10.0
        t = np.arange(int(sr * dur)) / sr
        tone = amp * np.sin(2 * np.pi * freq * t)
        kind = i % 10
        if kind < 5:
            payloads.append(encode_wav(tone, sr))
        elif kind < 8:
            stereo = np.stack([tone, 0.5 * tone], axis=1)
            payloads.append(encode_wav(stereo, sr))
        elif kind == 8:
            payloads.append(encode_wav(tone, sr, bits=8))
        else:
            payloads.append(b"OggS not really audio " + bytes(int(freq) % 256 for _ in range(16)))
        urls.append(f"https://audio.example/{i}")
    return pa.table({"url": pa.array(urls, pa.string()), "payload": pa.array(payloads, pa.binary())})


def audio_features_stage(ds, *, batch_size: int = 128, concurrency=(1, 4)):
    """(url, payload: binary) → ``AUDIO_SCHEMA`` rows via the actor-pool
    decode stage (small batches: wide binary rows)."""
    return ds.map_batches(
        AudioDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


# --------------------------------------------------------------------------
# FCV1 frame-concat video container + frame sampling
# --------------------------------------------------------------------------

_FCV_MAGIC = b"FCV1"


def encode_fcv(frames, fps: int = 10) -> bytes:
    """Pack a list of (h, w[, ch]) uint8 arrays as an FCV1 container:
    magic, fps, frame count, then length-prefixed PNG frames."""
    out = bytearray(_FCV_MAGIC)
    out += struct.pack("<II", fps, len(frames))
    for fr in frames:
        png = encode_png(np.asarray(fr, dtype=np.uint8))
        out += struct.pack("<I", len(png))
        out += png
    return bytes(out)


def _iter_fcv(data: bytes):
    """→ (fps, n_frames, [(frame_idx, png_bytes), ...]) or None."""
    if len(data) < 12 or data[:4] != _FCV_MAGIC:
        return None
    fps, n_frames = struct.unpack_from("<II", data, 4)
    pos, frames = 12, []
    for i in range(n_frames):
        if pos + 4 > len(data):
            return None
        (length,) = struct.unpack_from("<I", data, pos)
        pos += 4
        frames.append((i, data[pos : pos + length]))
        pos += length
    return int(fps), int(n_frames), frames


def sample_indices(n_frames: int, *, every: int = 0, max_frames: int = 0) -> np.ndarray:
    """Uniform frame selection: ``every`` keeps frames 0, k, 2k, …;
    ``max_frames`` caps the result by evenly-spaced subsampling (both 0
    → all frames). Deterministic, boundary-inclusive."""
    idx = np.arange(n_frames)
    if every > 1:
        idx = idx[::every]
    if max_frames and idx.size > max_frames:
        pick = np.linspace(0, idx.size - 1, max_frames).round().astype(np.int64)
        idx = idx[np.unique(pick)]
    return idx


VIDEO_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("frame_idx", pa.int64()),
        ("t_sec", pa.float64()),
        ("n_frames", pa.int64()),
        ("fps", pa.int64()),
        ("width", pa.int64()),
        ("height", pa.int64()),
        ("channels", pa.int64()),
        ("mean_lum", pa.float64()),
        ("std_lum", pa.float64()),
    ]
)


class FrameSampler:
    """Per-video frame sampling + per-frame decode. One input row emits
    one output row per SAMPLED frame; un-parsable payloads emit a single
    ``frame_idx=-1`` sentinel row (degrade per-row, never per-task)."""

    def __init__(self, *, every: int = 2, max_frames: int = 8) -> None:
        self.every = every
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {name: [] for name in VIDEO_SCHEMA.names}

        def emit(url, fi, t, nf, fps, w, h, ch, ml, sl):
            for k, v in zip(
                VIDEO_SCHEMA.names, (url, fi, t, nf, fps, w, h, ch, ml, sl)
            ):
                rows[k].append(v)

        urls = batch["url"].to_pylist()
        for url, payload in zip(urls, batch["payload"].to_pylist()):
            parsed = _iter_fcv(payload or b"")
            if parsed is None:
                emit(url, -1, 0.0, 0, 0, 0, 0, 0, 0.0, 0.0)
                continue
            fps, n_frames, frames = parsed
            keep = set(sample_indices(n_frames, every=self.every, max_frames=self.max_frames).tolist())
            for fi, png in frames:
                if fi not in keep:
                    continue
                dec = _decode_png(png)
                if dec is None:
                    emit(url, fi, fi / fps if fps else 0.0, n_frames, fps, 0, 0, 0, 0.0, 0.0)
                    continue
                w, h, ch, px = dec
                lum = _luminance(px, ch)
                emit(
                    url, fi, fi / fps if fps else 0.0, n_frames, fps,
                    w, h, ch, float(lum.mean()), float(lum.std()),
                )
        return pa.table(rows, schema=VIDEO_SCHEMA)


def synth_video_table(n: int, *, seed: int = 13) -> pa.Table:
    """Deterministic (url, payload) FCV1 fixture: short gradient 'videos'
    whose frame brightness ramps linearly (frame f has mean ≈ base + f·step,
    giving tests a closed-form per-frame truth); every 8th payload is junk."""
    rng = np.random.default_rng(seed)
    urls, payloads = [], []
    for i in range(n):
        if i % 8 == 7:
            payloads.append(b"\x00\x01junk video bytes" + bytes([i % 256]))
        else:
            w = 8 + int(rng.integers(0, 9))
            h = 6 + int(rng.integers(0, 7))
            nf = 4 + int(rng.integers(0, 9))
            base = int(rng.integers(10, 60))
            frames = [
                np.full((h, w), min(255, base + 12 * f), dtype=np.uint8)
                for f in range(nf)
            ]
            payloads.append(encode_fcv(frames, fps=5 + i % 3))
        urls.append(f"https://video.example/{i}")
    return pa.table({"url": pa.array(urls, pa.string()), "payload": pa.array(payloads, pa.binary())})


def video_frame_sample_stage(ds, *, every: int = 2, max_frames: int = 8,
                             batch_size: int = 32, concurrency=(1, 4)):
    """(url, payload: binary FCV1) → one ``VIDEO_SCHEMA`` row per sampled
    frame. batch_size is small — each row is a whole (short) video."""
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"every": every, "max_frames": max_frames},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
