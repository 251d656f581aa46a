"""Windowed-fused execution tests: a track chained through W-chunk
fused windows (LSTM state + unnormalized OLA boundary carried between
windows) must equal the single fused program, for any alignment of
track length vs window width.  This is the unbounded-track-length mode
behind the 30-minute single-program HBM ceiling (PERF.md; reference
behavior to match: split_inference handles any length, umx.cpp:152-295).
"""

import dataclasses

import jax
import numpy as np
import pytest

from umx_tpu.config import EngineConfig, ModelConfig, SegmentConfig
from umx_tpu.engine.separator import Separator
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
    rng = np.random.default_rng(7)
    # ~5.1 chunks at 0.5 s segments / 25% overlap -> 6 chunks; W=4 gives
    # a full window + a remainder window (padding path exercised)
    return rng.uniform(-0.5, 0.5, (2, int(2.1 * 44100))).astype(np.float32)


def _windowed_cfg(cfg, W, streaming=True):
    return dataclasses.replace(
        cfg,
        segment=dataclasses.replace(
            cfg.segment, window_chunks=W, streaming=streaming
        ),
    )


def test_windowed_streaming_matches_single_program(cfg, params, audio):
    ref = np.asarray(Separator(params, cfg).demix(audio))
    for W in (1, 2, 4):
        out = np.asarray(
            Separator(params, _windowed_cfg(cfg, W)).demix(audio)
        )
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=1e-5, err_msg=f"W={W}")


def test_windowed_nonstreaming_matches_single_program(cfg, params, audio):
    base = dataclasses.replace(
        cfg, segment=dataclasses.replace(cfg.segment, streaming=False)
    )
    ref = np.asarray(Separator(params, base).demix(audio))
    out = np.asarray(
        Separator(params, _windowed_cfg(cfg, 2, streaming=False)).demix(audio)
    )
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_windowed_device_input_stays_on_device(cfg, params, audio):
    """Device-resident input (the bench convention) returns device-resident
    stems — no per-window host fetch in the timed path."""
    sep = Separator(params, _windowed_cfg(cfg, 2))
    out = sep.demix(jax.device_put(audio))
    assert isinstance(out, jax.Array)
    ref = np.asarray(Separator(params, cfg).demix(audio))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_windowed_one_compiled_program_for_all_windows(cfg, params, audio):
    """Every window of every track reuses ONE compiled window program
    (fixed shapes); a second track of different length adds no compile."""
    from umx_tpu.engine import separator as sep_mod

    sep = Separator(params, _windowed_cfg(cfg, 2))
    sep.demix(audio)
    misses0 = sep_mod._demix_windowed_jit._cache_size()
    sep.demix(audio[:, : int(1.4 * 44100)])
    assert sep_mod._demix_windowed_jit._cache_size() == misses0


def test_windowed_auto_planner_brackets_measured_points():
    """Auto W (window_chunks=0) must land between the measured v5e
    anchors: the 30-minute single program (40 chunks) fits, the
    60-minute one (80 chunks) RESOURCE_EXHAUSTs (PERF.md)."""
    from umx_tpu.engine.memory import suggest_window_chunks

    umxl = EngineConfig()  # UMX-L 60 s streaming defaults
    w = suggest_window_chunks(umxl, hbm_bytes=int(15.75 * 2**30))
    assert 40 <= w < 80, w

    # reserving resident bytes shrinks the window
    w_res = suggest_window_chunks(
        umxl, hbm_bytes=int(15.75 * 2**30), resident_bytes=4 * 2**30
    )
    assert 1 <= w_res < w


def test_windowed_auto_uses_single_program_when_track_fits(cfg, params, audio, monkeypatch):
    """window_chunks=0 (auto) keeps the single fused program while the
    planner says the whole track fits, and goes windowed beyond."""
    from umx_tpu.engine import memory, separator as sep_mod

    calls = {"windowed": 0}
    orig = sep_mod.Separator._demix_windowed

    def spy(self, *a, **kw):
        calls["windowed"] += 1
        return orig(self, *a, **kw)

    monkeypatch.setattr(sep_mod.Separator, "_demix_windowed", spy)

    # plenty of headroom -> single program
    monkeypatch.setattr(memory, "suggest_window_chunks", lambda *a, **kw: 10_000)
    Separator(params, cfg).demix(audio)
    assert calls["windowed"] == 0

    # tiny window budget -> windowed
    monkeypatch.setattr(memory, "suggest_window_chunks", lambda *a, **kw: 2)
    Separator(params, cfg).demix(audio)
    assert calls["windowed"] == 1
