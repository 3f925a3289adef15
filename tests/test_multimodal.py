"""Multimodal stage plumbing tests: resize (real), video sampling (FVID
stand-in), audio features (real PCM DSP)."""

import numpy as np
import pyarrow as pa
import pytest

from logcrawler_ray.codecs import png, registry
from logcrawler_ray.sources import corpus
from logcrawler_ray.stages.multimodal import (
    AudioFeatures,
    ImageFeatures,
    ResizeStage,
    VideoFrameSample,
    encode_fake_video,
)


@pytest.fixture(scope="module")
def img_batch():
    return corpus.corpus_table(20, seed=9)


def test_resize_stage(ray_session, img_batch):
    import ray.data as rd

    out = rd.from_arrow(img_batch).map_batches(
        ResizeStage, fn_constructor_kwargs={"out_w": 32, "out_h": 24},
        batch_format="pyarrow", concurrency=1).to_pandas()
    assert out["resize_ok"].all()
    img, _ = png.decode(out["resized"].iloc[0])
    assert img.shape == (24, 32, 3)


def test_resize_preserves_mean_brightness(img_batch):
    stage = ResizeStage(out_w=16, out_h=16)
    out = stage(img_batch)
    row = out.slice(0, 1).to_pylist()[0]
    orig = registry.decode(row["fmt"], row["bytes"], row["w"], row["h"])
    small, _ = png.decode(row["resized"])
    assert abs(float(orig.mean()) - float(small.mean())) < 3.0


def test_image_features(img_batch):
    out = ImageFeatures()(img_batch)
    feats = out["features"].to_pylist()
    assert all(f is not None and len(f) == 19 for f in feats)


def test_video_frame_sample(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 256, (8, 10, 3)).astype(np.uint8) for _ in range(5)]
    vid = encode_fake_video(frames)
    batch = pa.table({"video_id": ["v1"], "bytes": [vid]})
    out = rd.from_arrow(batch).map_batches(
        VideoFrameSample, fn_constructor_kwargs={"every_k": 2},
        batch_format="pyarrow", concurrency=1).to_pandas()
    assert list(out["frame_idx"]) == [0, 2, 4]
    dec, _ = png.decode(out["bytes"].iloc[0])
    assert (dec == frames[0]).all()


def test_video_real_container_raises():
    batch = pa.table({"video_id": ["v"], "bytes": [b"\x00\x00\x00\x18ftypmp42"]})
    with pytest.raises(NotImplementedError):
        VideoFrameSample()(batch)


def test_audio_features():
    t = np.arange(16000) / 16000.0
    tone = (np.sin(2 * np.pi * 440 * t) * 0.5 * 32767).astype("<i2")
    silence = np.zeros(16000, dtype="<i2")
    batch = pa.table({"bytes": [tone.tobytes(), silence.tobytes(), b""]})
    out = AudioFeatures()(batch).to_pylist()
    assert out[0]["rms"] == pytest.approx(0.5 / np.sqrt(2), rel=1e-3)
    assert out[1]["rms"] == 0.0
    assert out[2]["rms"] == 0.0
    # 440 Hz tone: energy concentrated in the lowest band (0-1kHz)
    bands = out[0]["band_energy"]
    assert bands[0] > 0.9 * sum(bands)
    assert out[0]["zcr"] > 0.01
