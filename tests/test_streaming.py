"""Streaming demixer tests: arbitrary chunkings must reproduce the
offline demix exactly."""

import numpy as np
import pytest

from umx_tpu.config import EngineConfig, ModelConfig, SegmentConfig
from umx_tpu.engine.separator import Separator
from umx_tpu.engine.streaming import StreamingDemixer
from umx_tpu.models.umx import synthetic_params


@pytest.fixture(scope="module")
def cfg():
    return EngineConfig(
        model=ModelConfig(hidden_size=64),
        segment=SegmentConfig(segment_secs=0.5),
        shifts=0,
    )


@pytest.fixture(scope="module")
def params(cfg):
    return synthetic_params(cfg.model, seed=0)


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(111)
    return rng.uniform(-0.5, 0.5, (2, 60_000)).astype(np.float32)


@pytest.fixture(scope="module")
def offline(cfg, params, audio):
    return np.asarray(Separator(params, cfg).demix(audio))


@pytest.mark.parametrize("chunk_size", [1000, 7777, 30_000, 60_000])
def test_streamed_equals_offline(cfg, params, audio, offline, chunk_size):
    sd = StreamingDemixer(params, cfg)
    pieces = []
    for start in range(0, audio.shape[1], chunk_size):
        pieces.append(sd.push(audio[:, start : start + chunk_size]))
    pieces.append(sd.flush())
    streamed = np.concatenate(pieces, axis=-1)
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, atol=1e-5)


def test_latency_bounded(cfg, params, audio):
    # output becomes available as soon as one full segment is in
    sd = StreamingDemixer(params, cfg)
    seg = sd.seg
    out = sd.push(audio[:, : seg - 1])
    assert out.shape[-1] == 0
    out = sd.push(audio[:, seg - 1 : seg])
    assert out.shape[-1] == sd.stride
    assert sd.latency_samples == seg


def test_reset_reproduces(cfg, params, audio):
    sd = StreamingDemixer(params, cfg)
    a = np.concatenate([sd.push(audio), sd.flush()], axis=-1)
    sd.reset()
    b = np.concatenate([sd.push(audio), sd.flush()], axis=-1)
    np.testing.assert_array_equal(a, b)


def test_push_rejects_bad_shapes(cfg, params):
    sd = StreamingDemixer(params, cfg)
    with pytest.raises(ValueError):
        sd.push(np.zeros((3, 100), np.float32))
    with pytest.raises(ValueError):
        sd.push(np.zeros((100,), np.float32))
