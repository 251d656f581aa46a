"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(SURVEY §4: "multi-chip sharding tests on CPU jax")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umx_tpu.config import EngineConfig, ModelConfig, SegmentConfig
from umx_tpu.engine.separator import segment_forward
from umx_tpu.models.umx import init_lstm_state, synthetic_params
from umx_tpu.parallel.mesh import make_mesh
from umx_tpu.parallel.sharding import batched_lstm_state, demix_segments_batch


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


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.slow
def test_dp_batch_matches_single_device(cfg, params):
    mesh = make_mesh(dp=8, tp=1)
    n = cfg.segment.segment_samples(cfg.dsp.sample_rate)
    rng = np.random.default_rng(51)
    batch = rng.uniform(-0.5, 0.5, (8, 2, n)).astype(np.float32)

    states = batched_lstm_state(cfg, 8)
    out_b, st_b = demix_segments_batch(params, batch, states, cfg, mesh)
    out_b = np.asarray(out_b)

    st0 = init_lstm_state(cfg.model)
    for i in range(8):
        ref, _ = segment_forward(params, jnp.asarray(batch[i]), st0, cfg, n)
        np.testing.assert_allclose(out_b[i], np.asarray(ref), atol=2e-4)


@pytest.mark.slow
def test_tp4_full_target_sharding(cfg, params):
    # one target per chip pair: 2x4 mesh, target axis fully sharded
    mesh = make_mesh(dp=2, tp=4)
    n = cfg.segment.segment_samples(cfg.dsp.sample_rate)
    rng = np.random.default_rng(55)
    batch = rng.uniform(-0.5, 0.5, (2, 2, n)).astype(np.float32)
    states = batched_lstm_state(cfg, 2)
    out_b, _ = demix_segments_batch(params, batch, states, cfg, mesh, tp=True)
    st0 = init_lstm_state(cfg.model)
    ref, _ = segment_forward(params, jnp.asarray(batch[0]), st0, cfg, n)
    np.testing.assert_allclose(np.asarray(out_b)[0], np.asarray(ref), atol=2e-4)


def test_dp_tp_mesh_demix(cfg, params):
    # 4x2 mesh: tracks over dp, targets over tp
    mesh = make_mesh(dp=4, tp=2)
    n = cfg.segment.segment_samples(cfg.dsp.sample_rate)
    rng = np.random.default_rng(52)
    batch = rng.uniform(-0.5, 0.5, (4, 2, n)).astype(np.float32)
    states = batched_lstm_state(cfg, 4)
    out_b, _ = demix_segments_batch(params, batch, states, cfg, mesh)
    assert np.isfinite(np.asarray(out_b)).all()
    st0 = init_lstm_state(cfg.model)
    ref, _ = segment_forward(params, jnp.asarray(batch[0]), st0, cfg, n)
    np.testing.assert_allclose(np.asarray(out_b)[0], np.asarray(ref), atol=2e-4)


def _tpu_shaped(cfg):
    # The audit must check the program that ships on TPU: the matmul-DFT
    # path.  With the CPU backend's native `fft` op in the graph, XLA
    # cannot shard the FFT over the batch axis and inserts batch
    # all-gathers — a CPU-only artifact that does not exist on TPU
    # (axon has no XLA FFT; stft/istft lower to dot_general).
    import dataclasses

    return cfg.replace(dsp=dataclasses.replace(cfg.dsp, fft_impl="matmul"))


@pytest.mark.slow
def test_dp_fleet_hlo_has_no_collectives(cfg, params):
    """The dp fleet plan promises zero cross-chip communication inside a
    track's forward (mesh.py docstring); assert it on the compiled HLO."""
    from umx_tpu.parallel.sharding import audit_collectives

    mesh = make_mesh(dp=8, tp=1)
    n = cfg.segment.segment_samples(cfg.dsp.sample_rate)
    rng = np.random.default_rng(57)
    batch = rng.uniform(-0.5, 0.5, (8, 2, n)).astype(np.float32)
    states = batched_lstm_state(cfg, 8)
    found = audit_collectives(params, batch, states, _tpu_shaped(cfg), mesh)
    assert found == [], "collectives in dp hot path:\n" + "\n".join(found)


@pytest.mark.slow
def test_tp_inference_collectives_are_small_combines_only(cfg, params):
    """tp target sharding communicates ONLY at the target-combine points:
    per-target mask all-gathers and the Wiener mixture re-estimate's
    sum-over-sources, which lowers as one small (T, F)-sized complex
    all-reduce (~1.4 MB — cheap on ICI).  No all-to-all / permute /
    reduce-scatter, and no more than a handful of combine points."""
    from umx_tpu.parallel.sharding import audit_collectives

    mesh = make_mesh(dp=4, tp=2)
    n = cfg.segment.segment_samples(cfg.dsp.sample_rate)
    rng = np.random.default_rng(58)
    batch = rng.uniform(-0.5, 0.5, (4, 2, n)).astype(np.float32)
    states = batched_lstm_state(cfg, 4)
    found = audit_collectives(params, batch, states, _tpu_shaped(cfg), mesh, tp=True)
    bad = [
        s
        for s in found
        if "all-gather" not in s and "all-reduce" not in s
    ]
    assert bad == [], "unexpected collectives in tp path:\n" + "\n".join(bad)
    assert len(found) <= 4, "too many combine points:\n" + "\n".join(found)


@pytest.mark.slow
def test_training_step_dp_tp_loss_decreases(cfg, params):
    from umx_tpu.train import (
        TrainConfig,
        init_train_state,
        make_batch_from_audio,
        make_sharded_train_step,
    )

    mesh = make_mesh(dp=4, tp=2)
    tcfg = TrainConfig(seq_len=16, learning_rate=1e-3)
    rng = np.random.default_rng(53)
    B = 4
    n = cfg.dsp.hop * (tcfg.seq_len - 1)
    mix = rng.standard_normal((B, 2, n)).astype(np.float32) * 0.1
    targets = rng.standard_normal((B, 4, 2, n)).astype(np.float32) * 0.05

    with mesh:
        step, shard_state, shard_batch = make_sharded_train_step(
            cfg.model, tcfg, mesh, tp=True
        )
        batch = shard_batch(make_batch_from_audio(mix, targets, cfg.model, cfg.dsp, tcfg.seq_len))
        state = shard_state(init_train_state(params, tcfg))
        losses = []
        for _ in range(5):
            state, loss = step(state, batch)
            losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_graft_entry_single_chip():
    import __graft_entry__ as ge

    # compile-check a scaled-down version inline (full UMX-L compile is
    # covered by the driver); here we only assert the function is jittable
    fn, args = ge.entry()
    jaxpr = jax.make_jaxpr(fn)(*args)
    assert jaxpr is not None


@pytest.mark.slow
def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
