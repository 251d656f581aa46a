"""Per-layer activation parity vs the torch oracle — the automated
version of the reference's development methodology of print-and-diffing
every stage between PyTorch and its C++ until identical
(README.md:229-247, SURVEY §4b)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umx_tpu.config import ModelConfig
from umx_tpu.io.ggml import GGMLModel, TARGET_ORDER
from umx_tpu.models.umx import (
    _bilstm_layer,
    _post_lstm,
    _pre_lstm,
    init_lstm_state,
    params_from_ggml,
    resolve_compute,
    synthetic_state_dicts,
    umx_forward,
)

torch_oracle = pytest.importorskip("torch_oracle")


@pytest.fixture(scope="module")
def cfg():
    return ModelConfig(hidden_size=64)


@pytest.fixture(scope="module")
def state_dicts(cfg):
    return synthetic_state_dicts(cfg, seed=31)


@pytest.fixture(scope="module")
def params(cfg, state_dicts):
    return params_from_ggml(GGMLModel(cfg.hidden_size, state_dicts), cfg)


def jax_intermediates(tp, x, cfg):
    """Per-stage activations from the JAX forward, one target."""
    out = {}
    dtype = resolve_compute("float32")
    if cfg.input_scaling == "openunmix":
        scaled = (x + tp.input_mean) * tp.input_scale
    else:
        scaled = x * tp.input_scale + tp.input_mean
    out["input_scaled"] = np.asarray(scaled)

    h = _pre_lstm(tp, x, cfg, dtype)
    out["bn1_tanh"] = np.asarray(h)

    G = cfg.lstm_hidden
    lstm_in = h
    for layer in range(cfg.n_lstm_layers):
        lstm_in, _ = _bilstm_layer(
            lstm_in,
            tp.lstm_ih_w[layer], tp.lstm_ih_b[layer],
            tp.lstm_hh_w[layer], tp.lstm_hh_b[layer],
            jnp.zeros((2, G)), jnp.zeros((2, G)), dtype,
        )
        out[f"lstm_l{layer}"] = np.asarray(lstm_in)

    mask = _post_lstm(tp, h, lstm_in, cfg, dtype)
    out["mask"] = np.asarray(mask)
    return out


@pytest.mark.parametrize("target", TARGET_ORDER)
def test_every_stage_matches_torch(cfg, state_dicts, params, target):
    import torch

    rng = np.random.default_rng(32)
    x = (np.abs(rng.standard_normal((30, cfg.n_features))) * 0.3).astype(np.float32)

    t_idx = TARGET_ORDER.index(target)
    tp = jax.tree.map(lambda a: a[t_idx], params)
    ours = jax_intermediates(tp, jnp.asarray(x), cfg)

    oracle = torch_oracle.TorchUMX(cfg.hidden_size, nb_bins=cfg.nb_bins_cropped)
    oracle.load_target_state_dict(state_dicts[target])
    theirs = torch_oracle.oracle_intermediates(oracle, torch.from_numpy(x))

    for stage in ("input_scaled", "bn1_tanh", "lstm_l0", "lstm_l1", "lstm_l2", "mask"):
        a, b = ours[stage], theirs[stage]
        assert a.shape == b.shape, stage
        scale = np.abs(b).max() + 1e-6
        np.testing.assert_allclose(
            a, b, atol=3e-4 * scale, rtol=0, err_msg=f"stage {stage} diverged"
        )


@pytest.mark.slow
def test_streaming_boundary_matches_torch(cfg, state_dicts, params):
    """Two sequential segments with the LSTM carry flowing across the
    boundary must agree with nn.LSTM given the previous segment's (h, c)
    — cross-validating the streaming-state CONVENTION (layer/direction
    ordering, backward-direction carry semantics) against torch, not
    just our own round trip.  Reference semantics: lstm.cpp:82 /
    umx.cpp:167-171 (state never reset between segments)."""
    rng = np.random.default_rng(33)
    xs = [
        (np.abs(rng.standard_normal((24, cfg.n_features))) * 0.3).astype(np.float32)
        for _ in range(2)
    ]

    theirs = torch_oracle.oracle_masks_stream(state_dicts, xs, cfg.hidden_size)

    state = init_lstm_state(cfg)
    ours = []
    for x in xs:
        masks, state = umx_forward(params, jnp.asarray(x), state, cfg, "float32")
        ours.append(np.asarray(masks))

    for seg in range(2):
        scale = np.abs(theirs[seg]).max() + 1e-6
        np.testing.assert_allclose(
            ours[seg], theirs[seg], atol=3e-4 * scale, rtol=0,
            err_msg=f"segment {seg} diverged (state-carry convention mismatch)",
        )
