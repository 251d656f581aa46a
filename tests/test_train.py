"""Trainer tests: loss decreases, checkpoint round-trip, ggml export of
trained weights loads back identically."""

import numpy as np
import pytest

from umx_tpu.config import DSPConfig, ModelConfig
from umx_tpu.models.umx import synthetic_params
from umx_tpu.train import (
    TrainConfig,
    TrainState,
    export_ggml,
    init_train_state,
    make_batch_from_audio,
    make_train_step,
    restore_checkpoint,
    save_checkpoint,
)


@pytest.fixture(scope="module")
def cfg():
    return ModelConfig(hidden_size=64)


@pytest.fixture(scope="module")
def tcfg():
    return TrainConfig(seq_len=12, learning_rate=1e-3)


@pytest.fixture(scope="module")
def batch(cfg, tcfg):
    rng = np.random.default_rng(91)
    dsp = DSPConfig()
    B = 2
    n = dsp.hop * (tcfg.seq_len - 1)
    mix = rng.standard_normal((B, 2, n)).astype(np.float32) * 0.1
    targets = rng.standard_normal((B, 4, 2, n)).astype(np.float32) * 0.05
    return make_batch_from_audio(mix, targets, cfg, dsp, tcfg.seq_len)


@pytest.mark.slow
def test_unsharded_training_decreases_loss(cfg, tcfg, batch):
    import jax

    params = synthetic_params(cfg, seed=0)
    state = init_train_state(params, tcfg)
    step = jax.jit(make_train_step(cfg, tcfg))
    losses = []
    for _ in range(5):
        state, loss = step(state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_batchnorm_stats_frozen(cfg, tcfg, batch):
    """BN running stats are inference buffers: they must not move during
    training (AdamW on them can drive running_var negative -> NaN)."""
    import jax

    params = synthetic_params(cfg, seed=5)
    rv0 = np.asarray(params.bn1_rv).copy()
    rm0 = np.asarray(params.bn3_rm).copy()
    state = init_train_state(params, tcfg)
    step = jax.jit(make_train_step(cfg, tcfg))
    for _ in range(4):
        state, _ = step(state, batch)
    np.testing.assert_array_equal(np.asarray(state.params.bn1_rv), rv0)
    np.testing.assert_array_equal(np.asarray(state.params.bn3_rm), rm0)
    # trainable params did move
    assert not np.array_equal(np.asarray(state.params.fc1_w), np.asarray(params.fc1_w))
    assert not np.array_equal(
        np.asarray(state.params.input_mean), np.asarray(params.input_mean)
    )


@pytest.mark.slow
def test_checkpoint_round_trip(tmp_path, cfg, tcfg):
    import jax

    params = synthetic_params(cfg, seed=1)
    state = init_train_state(params, tcfg)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state)
    template = jax.tree.map(np.zeros_like, state)
    restored = restore_checkpoint(path, template)
    assert isinstance(restored, TrainState)
    np.testing.assert_array_equal(
        np.asarray(restored.params.fc1_w), np.asarray(state.params.fc1_w)
    )
    assert int(restored.step) == int(state.step)


@pytest.mark.slow
def test_lr_is_runtime_settable(cfg, tcfg, batch):
    """The injected LR must change optimizer behavior without retracing:
    with lr=0 the trainable params stay EXACTLY put."""
    import jax

    from umx_tpu.train import get_lr, set_lr

    params = synthetic_params(cfg, seed=3)
    state = init_train_state(params, tcfg)
    assert get_lr(state.opt_state) == pytest.approx(tcfg.learning_rate)
    state = TrainState(state.params, set_lr(state.opt_state, 0.0), state.step)
    step = jax.jit(make_train_step(cfg, tcfg))
    state2, _ = step(state, batch)
    np.testing.assert_array_equal(
        np.asarray(state2.params.fc1_w), np.asarray(params.fc1_w)
    )
    assert get_lr(state2.opt_state) == 0.0


def test_plateau_scheduler_semantics():
    from umx_tpu.train import PlateauScheduler

    s = PlateauScheduler(lr=1.0, gamma=0.5, patience=2, cooldown=1)
    assert s.update(1.0) == 1.0  # new best
    assert s.update(1.0) == 1.0  # bad 1
    assert s.update(1.0) == 1.0  # bad 2 (== patience, not yet >)
    assert s.update(1.0) == 0.5  # bad 3 > patience -> decay
    assert s.update(1.0) == 0.5  # cooldown round: no counting
    assert s.update(0.5) == 0.5  # improvement resets
    assert s.best == 0.5


def test_early_stopper_semantics():
    from umx_tpu.train import EarlyStopper

    e = EarlyStopper(patience=1)
    assert not e.update(1.0)  # best
    assert not e.update(1.0)  # bad 1
    assert e.update(1.0)  # bad 2 > patience
    e2 = EarlyStopper(patience=1)
    assert not e2.update(1.0)
    assert not e2.update(0.9)  # keeps improving
    assert not e2.update(0.8)


def test_export_ggml_round_trip(tmp_path, cfg):
    from umx_tpu.io.ggml import read_ggml
    from umx_tpu.models.umx import params_from_ggml

    params = synthetic_params(cfg, seed=2)
    path = str(tmp_path / "trained.bin.gz")
    export_ggml(params, path, cfg)
    back = params_from_ggml(read_ggml(path), cfg)
    # quantization-bounded round trip
    for name in ("fc1_w", "lstm_ih_w", "bn1_w", "output_mean"):
        a = np.asarray(getattr(params, name))
        b = np.asarray(getattr(back, name))
        step = (a.max() - a.min()) / 254.0
        assert np.max(np.abs(a - b)) <= step / 2 + 1e-6, name
