"""Cross-request segment batching tests (serving hot path, VERDICT r1 #8)."""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umx_tpu.config import EngineConfig, ModelConfig, SegmentConfig
from umx_tpu.engine.batcher import SegmentBatcher
from umx_tpu.engine.separator import Separator, segment_forward
from umx_tpu.models.umx import init_lstm_state, synthetic_params


@pytest.fixture(scope="module")
def cfg():
    return EngineConfig(
        model=ModelConfig(hidden_size=32),
        segment=SegmentConfig(segment_secs=0.5),
        shifts=0,
    )


@pytest.fixture(scope="module")
def params(cfg):
    return synthetic_params(cfg.model, seed=3)


def test_batched_equals_solo(cfg, params):
    rng = np.random.default_rng(4)
    n = cfg.segment.segment_samples(cfg.dsp.sample_rate)
    audio = jnp.asarray(rng.uniform(-0.5, 0.5, (2, n)).astype(np.float32))
    st = init_lstm_state(cfg.model)
    batcher = SegmentBatcher(max_batch=4, max_wait_ms=1.0)
    try:
        out_b, st_b = batcher.run(params, audio, st, cfg, n)
        out_s, st_s = segment_forward(params, audio, st, cfg, n)
        np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_s), atol=1e-5)
        for a, b in zip(jax.tree.leaves(st_b), jax.tree.leaves(st_s)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    finally:
        batcher.close()


def test_concurrent_tracks_coalesce_and_match(cfg, params):
    """N concurrent demix_track calls through one batcher must (a) produce
    exactly the single-request results — each request's streaming LSTM
    chain intact — and (b) actually coalesce: fewer device calls than
    jobs, with at least one batch of size >= 2."""
    rng = np.random.default_rng(5)
    sr = cfg.dsp.sample_rate
    tracks = [
        rng.uniform(-0.5, 0.5, (2, int(1.2 * sr))).astype(np.float32) for _ in range(4)
    ]
    sep = Separator(params, cfg)
    want = [sep.demix_track(t, seed=0) for t in tracks]

    batcher = SegmentBatcher(max_batch=4, max_wait_ms=200.0)
    got = [None] * len(tracks)
    errs = []

    def work(i):
        try:
            got[i] = sep.demix_track(tracks[i], seed=0, segment_fn=batcher.run)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    try:
        # compile both batch-size programs first so coalescing isn't
        # disturbed by compile stalls
        n = cfg.segment.segment_samples(sr)
        st = init_lstm_state(cfg.model)
        batcher.run(params, jnp.zeros((2, n), jnp.float32), st, cfg, n)

        threads = [threading.Thread(target=work, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert not errs, errs
        for i in range(4):
            np.testing.assert_allclose(got[i], want[i], atol=1e-4)
        assert batcher.stats.max_batch_observed >= 2, batcher.stats
        assert batcher.stats.device_calls < batcher.stats.jobs, batcher.stats
    finally:
        batcher.close()


def test_mixed_shape_keys_do_not_cross_batch(cfg, params):
    # a no-wiener request must never share a device call with a wiener one
    import dataclasses

    n = cfg.segment.segment_samples(cfg.dsp.sample_rate)
    audio = jnp.zeros((2, n), jnp.float32)
    st = init_lstm_state(cfg.model)
    cfg2 = dataclasses.replace(cfg, use_wiener=False)
    batcher = SegmentBatcher(max_batch=4, max_wait_ms=1.0)
    try:
        o1, _ = batcher.run(params, audio, st, cfg, n)
        o2, _ = batcher.run(params, audio, st, cfg2, n)
        assert o1.shape == o2.shape
        assert batcher.stats.device_calls == 2
    finally:
        batcher.close()
