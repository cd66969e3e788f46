"""Real image decode (stages/media.py): byte-exact encode→decode
round-trips for every supported PNG shape × scanline filter and for BMP,
graceful per-row degradation on non-images, and the actor-pool Ray stage
(schema, determinism)."""

import numpy as np
import pyarrow as pa
import pytest

from mdmpublic_ray.stages.media import (
    MEDIA_SCHEMA,
    RealDecoder,
    _decode_bmp,
    _decode_png,
    _luminance,
    encode_bmp,
    encode_png,
    media_features_stage,
    synth_image_table,
)


@pytest.mark.parametrize("ch", [1, 3, 4])
@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_png_roundtrip_exact(ch, ft):
    rng = np.random.default_rng(ch * 10 + ft)
    shape = (11, 17) if ch == 1 else (11, 17, ch)
    a = rng.integers(0, 256, size=shape, dtype=np.uint8)
    w, h, c, px = _decode_png(encode_png(a, filter_type=ft))
    assert (w, h, c) == (17, 11, ch)
    assert np.array_equal(px, a.reshape(11, -1))


def test_bmp_roundtrip_exact_including_padding():
    rng = np.random.default_rng(5)
    # width 13 → stride padding exercised (13*3 = 39 → 40)
    a = rng.integers(0, 256, size=(9, 13, 3), dtype=np.uint8)
    w, h, c, px = _decode_bmp(encode_bmp(a))
    assert (w, h, c) == (13, 9, 3)
    assert np.array_equal(px, a.reshape(9, -1))


def test_decoder_degrades_per_row_not_per_task():
    t = pa.table(
        {
            "url": pa.array(["a", "b", "c", "d"], pa.string()),
            "payload": pa.array(
                [
                    encode_png(np.zeros((4, 4), dtype=np.uint8)),
                    b"\x89PNG\r\n\x1a\nGARBAGE-after-signature",
                    b"not an image at all",
                    None,
                ],
                pa.binary(),
            ),
        }
    )
    df = RealDecoder()(t).to_pandas()
    assert list(df["format"]) == ["png", "unsupported", "unsupported", "unsupported"]
    assert df.loc[0, "width"] == 4 and df.loc[0, "mean_lum"] == 0.0
    assert (df.loc[1:, "width"] == 0).all()
    assert df.loc[3, "n_bytes"] == 0


def test_luminance_statistics_match_pixels():
    rng = np.random.default_rng(11)
    a = rng.integers(0, 256, size=(8, 9, 3), dtype=np.uint8)
    t = pa.table(
        {"url": pa.array(["x"], pa.string()),
         "payload": pa.array([encode_png(a)], pa.binary())}
    )
    df = RealDecoder()(t).to_pandas()
    lum = _luminance(a.reshape(8, -1), 3)
    assert df.loc[0, "mean_lum"] == pytest.approx(lum.mean(), abs=1e-12)
    assert df.loc[0, "std_lum"] == pytest.approx(lum.std(), abs=1e-12)


def test_media_stage_real_decoder(ray_session):
    import ray.data as rd

    t = synth_image_table(60, seed=3)
    out = media_features_stage(rd.from_arrow(t), batch_size=16)
    df = out.to_pandas().sort_values("url").reset_index(drop=True)
    assert out.schema().names == MEDIA_SCHEMA.names
    assert len(df) == 60
    counts = df["format"].value_counts().to_dict()
    assert counts.get("png", 0) > 0 and counts.get("bmp", 0) > 0
    assert counts.get("unsupported", 0) == 6  # every 10th payload
    decoded = df[df["format"] != "unsupported"]
    assert (decoded["width"] > 0).all() and (decoded["height"] > 0).all()
    assert (decoded["std_lum"] > 0).all()
    # deterministic fixture + decode → identical second run
    df2 = (
        media_features_stage(rd.from_arrow(synth_image_table(60, seed=3)), batch_size=16)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert df.equals(df2)
