"""Mask-network golden-parity tests against the independent PyTorch
oracle (automating the reference's manual print-and-diff methodology,
README.md:229-247 / SURVEY §4)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from umx_tpu.config import ModelConfig
from umx_tpu.io.ggml import GGMLModel
from umx_tpu.models.umx import (
    init_lstm_state,
    params_from_ggml,
    synthetic_state_dicts,
    umx_forward,
)

torch_oracle = pytest.importorskip("torch_oracle")


@pytest.fixture(scope="module")
def cfg():
    return ModelConfig(hidden_size=64)


@pytest.fixture(scope="module")
def state_dicts(cfg):
    return synthetic_state_dicts(cfg, seed=11)


@pytest.fixture(scope="module")
def params(cfg, state_dicts):
    return params_from_ggml(GGMLModel(cfg.hidden_size, state_dicts), cfg)


@pytest.fixture(scope="module")
def x(cfg):
    rng = np.random.default_rng(12)
    # magnitude-like input: non-negative, peaked at low bins
    T = 50
    return (np.abs(rng.standard_normal((T, cfg.n_features))) * 0.3).astype(np.float32)


@pytest.mark.parametrize("scaling", ["openunmix", "umxcpp"])
def test_forward_matches_torch_oracle(cfg, state_dicts, params, x, scaling):
    c = dataclasses.replace(cfg, input_scaling=scaling)
    masks, _ = umx_forward(params, jnp.asarray(x), init_lstm_state(c), c)
    ref = torch_oracle.oracle_masks(state_dicts, x, cfg.hidden_size, scaling)
    assert masks.shape == ref.shape == (4, x.shape[0], cfg.n_outputs)
    np.testing.assert_allclose(np.asarray(masks), ref, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_bfloat16_matmul_path_close_to_f32(cfg, params, x):
    """The bf16 fast path (bf16 MXU inputs, f32 accumulation, f32 gate
    math and state) must stay close to full f32 — relative mask error
    well under 1% so SDR impact is negligible."""
    st = init_lstm_state(cfg)
    m32, _ = umx_forward(params, jnp.asarray(x), st, cfg, "float32")
    m16, _ = umx_forward(params, jnp.asarray(x), st, cfg, "bfloat16")
    m32, m16 = np.asarray(m32), np.asarray(m16)
    assert m16.dtype == np.float32  # output stays f32
    denom = np.abs(m32).mean() + 1e-6
    rel = np.abs(m16 - m32).mean() / denom
    assert rel < 0.01, rel


def test_masks_nonnegative(cfg, params, x):
    masks, _ = umx_forward(params, jnp.asarray(x), init_lstm_state(cfg), cfg)
    assert np.asarray(masks).min() >= 0.0


@pytest.mark.slow
def test_streaming_state_changes_and_propagates(cfg, params, x):
    st0 = init_lstm_state(cfg)
    m1, st1 = umx_forward(params, jnp.asarray(x), st0, cfg)
    assert not np.allclose(np.asarray(st1.h), 0.0)
    assert st1.h.shape == st0.h.shape

    # feeding the carried state must change the output (streaming LSTM
    # semantics: umx.cpp:167-171 / lstm.cpp:82)
    m2_stream, _ = umx_forward(params, jnp.asarray(x), st1, cfg)
    m2_fresh, _ = umx_forward(params, jnp.asarray(x), st0, cfg)
    assert not np.allclose(np.asarray(m2_stream), np.asarray(m2_fresh))


def test_streaming_matches_torch_two_chunk_forward(cfg, state_dicts, params, x):
    """Chunked JAX inference with state carry must equal the oracle fed
    each chunk with torch's own carried (h, c) per direction.

    torch.nn.LSTM returns (h_n, c_n) where, for the reverse direction,
    h_n is the state after scanning the chunk right-to-left — exactly
    what our scan carries into the next chunk."""
    import torch

    from umx_tpu.io.ggml import TARGET_ORDER

    half = x.shape[0] // 2
    xa, xb = x[:half], x[half:]

    st = init_lstm_state(cfg)
    ma, st = umx_forward(params, jnp.asarray(xa), st, cfg)
    mb, _ = umx_forward(params, jnp.asarray(xb), st, cfg)

    for ti, tname in enumerate(TARGET_ORDER):
        m = torch_oracle.TorchUMX(cfg.hidden_size, nb_bins=cfg.nb_bins_cropped)
        m.load_target_state_dict(state_dicts[tname])
        m.eval()
        with torch.no_grad():
            hc = None
            for chunk, ours in ((xa, ma), (xb, mb)):
                xt = torch.from_numpy(chunk)
                mean = torch.cat([m.input_mean, m.input_mean])
                scale = torch.cat([m.input_scale, m.input_scale])
                h = (xt + mean) * scale
                h = torch.tanh(m.bn1(m.fc1(h)))
                lstm_out, hc = m.lstm(h.unsqueeze(1), hc)
                z = torch.cat([h, lstm_out.squeeze(1)], dim=-1)
                z = torch.relu(m.bn2(m.fc2(z)))
                z = m.bn3(m.fc3(z))
                out_scale = torch.cat([m.output_scale, m.output_scale])
                out_mean = torch.cat([m.output_mean, m.output_mean])
                ref = torch.relu(z * out_scale + out_mean).numpy()
                np.testing.assert_allclose(
                    np.asarray(ours)[ti], ref, atol=2e-4, rtol=1e-3
                )


@pytest.mark.slow
def test_umxl_scale_parity():
    """Golden parity at the real UMX-L size (hidden=1024, 2974->1024
    fc1, 3x bidir LSTM 1024->512, 4098-dim masks) — catches any
    shape-threading bug the hidden=64 tests can't see."""
    cfg = ModelConfig(hidden_size=1024)
    sds = synthetic_state_dicts(cfg, seed=77)
    params = params_from_ggml(GGMLModel(cfg.hidden_size, sds), cfg)
    rng = np.random.default_rng(78)
    x = (np.abs(rng.standard_normal((20, cfg.n_features))) * 0.3).astype(np.float32)
    masks, _ = umx_forward(params, jnp.asarray(x), init_lstm_state(cfg), cfg)
    ref = torch_oracle.oracle_masks(sds, x, cfg.hidden_size)
    assert masks.shape == (4, 20, 4098)
    np.testing.assert_allclose(np.asarray(masks), ref, atol=5e-4, rtol=2e-3)


@pytest.mark.slow
def test_vmap_matches_single_target(cfg, state_dicts, params, x):
    # the vmapped all-targets forward must equal running each target alone
    import jax

    from umx_tpu.models.umx import _forward_one_target

    st = init_lstm_state(cfg)
    masks, _ = umx_forward(params, jnp.asarray(x), st, cfg)
    for t in range(4):
        pt = jax.tree.map(lambda a: a[t], params)
        m, _ = _forward_one_target(pt, jnp.asarray(x), st.h[t], st.c[t], cfg)
        np.testing.assert_allclose(np.asarray(m), np.asarray(masks)[t], atol=1e-5)
