"""Audio/video multimodal stages (stages/av.py) and the resize leg
(stages/media.py Thumbnailer): exact WAV encode→decode round-trips,
closed-form signal stats (sine RMS = amp/√2, ZCR = 2f/sr), FCV1 frame
sampling semantics, nearest-neighbor resize vs a numpy reference, and
the actor-pool Ray stages (schema, expansion, determinism)."""

import numpy as np
import pyarrow as pa
import pytest

from mdmpublic_ray.stages.av import (
    AUDIO_SCHEMA,
    AudioDecoder,
    FrameSampler,
    VIDEO_SCHEMA,
    _decode_wav,
    _iter_fcv,
    audio_features_stage,
    encode_fcv,
    encode_wav,
    sample_indices,
    synth_audio_table,
    synth_video_table,
    video_frame_sample_stage,
)
from mdmpublic_ray.stages.media import (
    THUMB_SCHEMA,
    Thumbnailer,
    encode_png,
    media_thumbnails_stage,
    resize_nearest,
    synth_image_table,
)

# --------------------------------------------------------------------------
# WAV
# --------------------------------------------------------------------------


@pytest.mark.parametrize("ch", [1, 2, 3])
def test_wav_roundtrip_exact_16bit(ch):
    rng = np.random.default_rng(ch)
    a = rng.integers(-32768, 32768, size=(101, ch)).astype(np.int16)
    sr, got_ch, x = _decode_wav(encode_wav(a, 12345))
    assert (sr, got_ch) == (12345, ch)
    assert np.array_equal(np.round(x * 32768.0).astype(np.int16), a)


def test_wav_roundtrip_8bit_and_odd_length_alignment():
    a = np.array([0, 64, 128, 192, 255], dtype=np.uint8)  # odd data size → pad byte
    blob = encode_wav(a, 8000, bits=8)
    assert len(blob) % 2 == 0
    sr, ch, x = _decode_wav(blob)
    assert (sr, ch) == (8000, 1)
    assert np.array_equal((np.round(x * 128.0) + 128).astype(np.uint8).ravel(), a)


def test_wav_chunk_walking_skips_unknown_chunks():
    a = np.array([1000, -1000, 2000], dtype=np.int16)
    blob = bytearray(encode_wav(a, 16000))
    # splice a LIST chunk between fmt and data
    fmt_end = blob.index(b"data")
    extra = b"LIST" + (7).to_bytes(4, "little") + b"INFOxyz" + b"\x00"
    spliced = bytes(blob[:fmt_end]) + extra + bytes(blob[fmt_end:])
    spliced = spliced[:4] + (len(spliced) - 8).to_bytes(4, "little") + spliced[8:]
    sr, ch, x = _decode_wav(spliced)
    assert sr == 16000 and ch == 1
    assert np.array_equal(np.round(x * 32768.0).astype(np.int16).ravel(), a)


def test_wav_rejects_non_pcm_and_garbage():
    a = np.zeros(10, dtype=np.int16)
    blob = bytearray(encode_wav(a, 8000))
    fmt_off = blob.index(b"fmt ") + 8
    blob[fmt_off:fmt_off + 2] = (3).to_bytes(2, "little")  # IEEE float
    assert _decode_wav(bytes(blob)) is None
    assert _decode_wav(b"OggS definitely not riff") is None
    assert _decode_wav(b"RIFF\x00\x00\x00\x00AVI ") is None


def test_audio_stats_closed_form_sine():
    sr, freq, amp, dur = 16000, 400.0, 0.5, 0.5
    t = np.arange(int(sr * dur)) / sr
    tone = amp * np.sin(2 * np.pi * freq * t)
    batch = pa.table(
        {"url": pa.array(["s"], pa.string()),
         "payload": pa.array([encode_wav(tone, sr)], pa.binary())}
    )
    df = AudioDecoder()(batch).to_pandas()
    assert df.loc[0, "format"] == "wav"
    assert df.loc[0, "sample_rate"] == sr
    assert df.loc[0, "duration_sec"] == pytest.approx(dur, abs=1e-9)
    assert df.loc[0, "rms"] == pytest.approx(amp / np.sqrt(2), rel=1e-3)
    assert df.loc[0, "peak"] == pytest.approx(amp, rel=1e-3)
    # a sine crosses zero twice per period → ZCR ≈ 2f/sr
    assert df.loc[0, "zero_cross_rate"] == pytest.approx(2 * freq / sr, rel=0.02)


def test_audio_decoder_degrades_per_row():
    batch = pa.table(
        {"url": pa.array(["a", "b", "c"], pa.string()),
         "payload": pa.array(
             [encode_wav(np.zeros(4, dtype=np.int16), 8000), b"junk", None],
             pa.binary())}
    )
    df = AudioDecoder()(batch).to_pandas()
    assert list(df["format"]) == ["wav", "unsupported", "unsupported"]
    assert df.loc[1, "sample_rate"] == 0 and df.loc[2, "n_bytes"] == 0


def test_audio_stage_schema_and_determinism(ray_session):
    import ray.data as rd

    out = audio_features_stage(rd.from_arrow(synth_audio_table(50, seed=4)), batch_size=16)
    df = out.to_pandas().sort_values("url").reset_index(drop=True)
    assert out.schema().names == AUDIO_SCHEMA.names
    assert len(df) == 50
    assert (df["format"] == "unsupported").sum() == 5  # every 10th payload
    wav = df[df["format"] == "wav"]
    assert (wav["sample_rate"] > 0).all() and (wav["rms"] > 0).all()
    assert set(wav["channels"]) == {1, 2}
    df2 = (
        audio_features_stage(rd.from_arrow(synth_audio_table(50, seed=4)), batch_size=16)
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    assert df.equals(df2)


# --------------------------------------------------------------------------
# FCV1 frame sampling
# --------------------------------------------------------------------------


def test_fcv_container_roundtrip():
    frames = [np.full((4, 5), 10 * f, dtype=np.uint8) for f in range(6)]
    fps, n, pairs = _iter_fcv(encode_fcv(frames, fps=12))
    assert (fps, n) == (12, 6)
    from mdmpublic_ray.stages.media import _decode_png

    for fi, png in pairs:
        w, h, ch, px = _decode_png(png)
        assert (w, h, ch) == (5, 4, 1)
        assert np.array_equal(px, frames[fi])


def test_sample_indices_semantics():
    assert sample_indices(10, every=3).tolist() == [0, 3, 6, 9]
    assert sample_indices(10).tolist() == list(range(10))
    picked = sample_indices(100, max_frames=5)
    assert picked.tolist() == [0, 25, 50, 74, 99]
    both = sample_indices(20, every=2, max_frames=4)
    assert both[0] == 0 and both[-1] == 18 and len(both) == 4


def test_frame_sampler_rows_and_brightness_ramp():
    # 9 frames, brightness base + 12*f — closed-form per-frame truth
    frames = [np.full((6, 8), 20 + 12 * f, dtype=np.uint8) for f in range(9)]
    batch = pa.table(
        {"url": pa.array(["v", "bad"], pa.string()),
         "payload": pa.array([encode_fcv(frames, fps=6), b"nope"], pa.binary())}
    )
    df = FrameSampler(every=2, max_frames=8)(batch).to_pandas()
    good = df[df["url"] == "v"]
    assert good["frame_idx"].tolist() == [0, 2, 4, 6, 8]
    assert good["t_sec"].tolist() == [0.0, 2 / 6, 4 / 6, 1.0, 8 / 6]
    assert good["mean_lum"].tolist() == [20.0, 44.0, 68.0, 92.0, 116.0]
    assert (good["std_lum"] == 0.0).all()
    bad = df[df["url"] == "bad"]
    assert bad["frame_idx"].tolist() == [-1] and bad.iloc[0]["n_frames"] == 0


def test_video_stage_expansion(ray_session):
    import ray.data as rd

    t = synth_video_table(24, seed=2)
    out = video_frame_sample_stage(rd.from_arrow(t), every=2, max_frames=4, batch_size=8)
    df = out.to_pandas()
    assert out.schema().names == VIDEO_SCHEMA.names
    assert df["url"].nunique() == 24  # every video emits ≥1 row
    junk = df[df["frame_idx"] == -1]
    assert junk["url"].nunique() == 3  # every 8th payload
    real = df[df["frame_idx"] >= 0]
    assert (real.groupby("url")["frame_idx"].count() <= 4).all()
    assert (real["width"] > 0).all()
    # sampled timestamps follow frame_idx / fps exactly
    assert np.allclose(real["t_sec"], real["frame_idx"] / real["fps"])


# --------------------------------------------------------------------------
# Resize / thumbnails
# --------------------------------------------------------------------------


def test_resize_nearest_matches_reference_gather():
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, size=(23, 31, 3), dtype=np.uint8)
    out = resize_nearest(px, 7, 5)
    assert out.shape == (7, 5, 3)
    for y in range(7):
        for x in range(5):
            sy = min(int((y + 0.5) * 23 / 7), 22)
            sx = min(int((x + 0.5) * 31 / 5), 30)
            assert np.array_equal(out[y, x], px[sy, sx])
    # identity when sizes match
    assert np.array_equal(resize_nearest(px, 23, 31), px)


def test_thumbnailer_fixed_shape_and_degradation():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(40, 60, 3), dtype=np.uint8)
    batch = pa.table(
        {"url": pa.array(["i", "j"], pa.string()),
         "payload": pa.array([encode_png(img), b"not image"], pa.binary())}
    )
    df = Thumbnailer(thumb_h=8, thumb_w=12)(batch).to_pandas()
    assert df.loc[0, "format"] == "png"
    thumb = np.frombuffer(df.loc[0, "thumb"], dtype=np.uint8).reshape(8, 12, 3)
    assert np.array_equal(thumb, resize_nearest(img, 8, 12))
    assert df.loc[1, "thumb"] == b"" and df.loc[1, "src_width"] == 0


def test_dhash_encoding_invariant_and_discriminative():
    from mdmpublic_ray.stages.media import (
        _decode_bmp,
        _decode_png,
        dhash64,
        encode_bmp,
    )

    rng = np.random.default_rng(21)
    rgb = rng.integers(0, 256, size=(14, 19, 3), dtype=np.uint8)
    hashes = set()
    for blob, dec in (
        (encode_png(rgb, filter_type=0), _decode_png),
        (encode_png(rgb, filter_type=3), _decode_png),
        (encode_bmp(rgb), _decode_bmp),
    ):
        w, h, ch, px = dec(blob)
        hashes.add(dhash64(px, ch))
    assert len(hashes) == 1  # same pixels → same hash, any encoding
    other = rng.integers(0, 256, size=(14, 19, 3), dtype=np.uint8)
    assert dhash64(other.reshape(14, -1), 3) not in hashes


def test_image_dedup_planted_truth(ray_session):
    import ray.data as rd

    from mdmpublic_ray.stages.media import image_dedup_stage, synth_dup_image_table

    n_fam = 30
    df = image_dedup_stage(rd.from_arrow(synth_dup_image_table(n_fam))).to_pandas()
    # families ≡ 0 (mod 3) are the planted dup groups: 3 copies each,
    # 3 distinct byte encodings, keeper = lexically-first variant url
    assert len(df) == 10
    assert (df["n_copies"] == 3).all()
    assert (df["n_encodings"] == 3).all()
    assert sorted(df["keeper_url"]) == sorted(
        f"https://img.example/f{i}/v0" for i in range(0, n_fam, 3)
    )


def test_thumbnail_stage(ray_session):
    import ray.data as rd

    out = media_thumbnails_stage(rd.from_arrow(synth_image_table(40, seed=6)), batch_size=16)
    df = out.to_pandas()
    assert out.schema().names == THUMB_SCHEMA.names
    assert len(df) == 40
    ok = df[df["format"] != "unsupported"]
    # fixed-shape contract: every thumb is exactly h*w*ch bytes
    assert (ok["thumb"].str.len() == 16 * 16 * ok["channels"]).all()
    assert (ok["mean_lum"] > 0).all()
