"""Pallas LSTM kernel tests (interpreter mode on CPU): the kernel path
must match the lax.scan path, including streaming state carry."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from umx_tpu.config import ModelConfig
from umx_tpu.models.umx import (
    init_lstm_state,
    synthetic_params,
    umx_forward,
)


@pytest.fixture(scope="module")
def cfg_scan():
    return ModelConfig(hidden_size=64, lstm_impl="scan")


@pytest.fixture(scope="module")
def cfg_pallas(cfg_scan):
    return dataclasses.replace(cfg_scan, lstm_impl="pallas_interpret")


def test_auto_impl_resolution(monkeypatch):
    """"auto" picks the merged Pallas kernel on TPU and lax.scan
    elsewhere; explicit choices pass through untouched."""
    import jax

    from umx_tpu.models.umx import resolve_lstm_impl

    assert resolve_lstm_impl("scan") == "scan"
    assert resolve_lstm_impl("pallas_merged") == "pallas_merged"
    assert resolve_lstm_impl("auto") == "scan"  # tests force CPU
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert resolve_lstm_impl("auto") == "pallas_merged"


@pytest.fixture(scope="module")
def params(cfg_scan):
    return synthetic_params(cfg_scan, seed=21)


@pytest.fixture(scope="module")
def x(cfg_scan):
    rng = np.random.default_rng(22)
    return jnp.asarray(
        (np.abs(rng.standard_normal((24, cfg_scan.n_features))) * 0.3).astype(np.float32)
    )


def test_kernel_layer_matches_scan_layer():
    from umx_tpu.models.umx import _bilstm_layer
    from umx_tpu.ops.lstm_pallas import lstm_layer_pallas

    rng = np.random.default_rng(23)
    Tn, T, D, G, IN = 4, 12, 2, 16, 32
    x = rng.standard_normal((Tn, T, IN)).astype(np.float32) * 0.3
    ih_w = rng.standard_normal((Tn, D, IN, 4 * G)).astype(np.float32) * 0.1
    hh_w = rng.standard_normal((Tn, D, G, 4 * G)).astype(np.float32) * 0.1
    ih_b = rng.standard_normal((Tn, D, 4 * G)).astype(np.float32) * 0.1
    hh_b = np.zeros((Tn, D, 4 * G), np.float32)
    h0 = rng.standard_normal((Tn, D, G)).astype(np.float32) * 0.1
    c0 = rng.standard_normal((Tn, D, G)).astype(np.float32) * 0.1

    # reference: per-target scan (bf16 matmuls to match the kernel's
    # bf16 weight residency)
    import jax

    outs, hTs, cTs = [], [], []
    for j in range(Tn):
        out, (hT, cT) = _bilstm_layer(
            jnp.asarray(x[j]), jnp.asarray(ih_w[j]), jnp.asarray(ih_b[j]),
            jnp.asarray(hh_w[j]), jnp.asarray(hh_b[j]),
            jnp.asarray(h0[j]), jnp.asarray(c0[j]), jnp.bfloat16,
        )
        outs.append(np.asarray(out))
        hTs.append(np.asarray(hT))
        cTs.append(np.asarray(cT))

    # kernel: build x_proj exactly like the staged forward
    xs = jnp.stack([jnp.asarray(x), jnp.asarray(x)[:, ::-1]], axis=1)
    proj = jnp.einsum(
        "jdti,jdig->jtdg",
        xs.astype(jnp.bfloat16),
        jnp.asarray(ih_w).astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) + (jnp.asarray(ih_b) + jnp.asarray(hh_b))[:, None]
    hs, hT, cT = lstm_layer_pallas(
        proj, jnp.asarray(hh_w), jnp.asarray(h0), jnp.asarray(c0), interpret=True
    )
    out_k = jnp.concatenate([hs[:, :, 0], hs[:, ::-1, 1]], axis=-1)

    np.testing.assert_allclose(np.asarray(out_k), np.stack(outs), atol=5e-3)
    np.testing.assert_allclose(np.asarray(hT), np.stack(hTs), atol=5e-3)
    np.testing.assert_allclose(np.asarray(cT), np.stack(cTs), atol=5e-3)
    del jax


@pytest.mark.slow
def test_merged_kernel_matches_blocked_kernel():
    from umx_tpu.ops.lstm_pallas import lstm_layer_pallas, lstm_layer_pallas_merged

    rng = np.random.default_rng(24)
    Tn, T, D, G = 4, 19, 2, 16  # T deliberately not a multiple of K
    x_proj = jnp.asarray(rng.standard_normal((Tn, T, D, 4 * G)).astype(np.float32) * 0.2)
    hh_w = jnp.asarray(rng.standard_normal((Tn, D, G, 4 * G)).astype(np.float32) * 0.1)
    h0 = jnp.asarray(rng.standard_normal((Tn, D, G)).astype(np.float32) * 0.1)
    c0 = jnp.asarray(rng.standard_normal((Tn, D, G)).astype(np.float32) * 0.1)

    a = lstm_layer_pallas(x_proj, hh_w, h0, c0, time_block=8, interpret=True)
    b = lstm_layer_pallas_merged(x_proj, hh_w, h0, c0, time_block=8, interpret=True)
    for xa, xb in zip(a, b):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb), atol=1e-5)


def test_blocked_kernel_partial_final_block():
    # time_block > T and non-divisible T exercise the partial-block path
    from umx_tpu.ops.lstm_pallas import lstm_layer_pallas

    rng = np.random.default_rng(25)
    Tn, T, D, G = 2, 5, 2, 8
    x_proj = jnp.asarray(rng.standard_normal((Tn, T, D, 4 * G)).astype(np.float32) * 0.2)
    hh_w = jnp.asarray(rng.standard_normal((Tn, D, G, 4 * G)).astype(np.float32) * 0.1)
    h0 = jnp.zeros((Tn, D, G), jnp.float32)
    c0 = jnp.zeros((Tn, D, G), jnp.float32)
    a = lstm_layer_pallas(x_proj, hh_w, h0, c0, time_block=4, interpret=True)
    b = lstm_layer_pallas(x_proj, hh_w, h0, c0, time_block=16, interpret=True)
    for xa, xb in zip(a, b):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb), atol=1e-5)


@pytest.mark.slow
def test_merged_kernel_batch_native_vmap():
    """vmap over the merged kernel folds the mapped axis into matmul
    rows (custom_vmap rule) and must match per-example invocation, for
    batched, broadcast-state, and nested-vmap shapes."""
    import jax

    from umx_tpu.ops.lstm_pallas import lstm_layer_pallas_merged

    rng = np.random.default_rng(26)
    B, Tn, T, D, G = 3, 2, 7, 2, 8
    xb = jnp.asarray(rng.standard_normal((B, Tn, T, D, 4 * G)).astype(np.float32) * 0.2)
    hh_w = jnp.asarray(rng.standard_normal((Tn, D, G, 4 * G)).astype(np.float32) * 0.1)
    h0 = jnp.asarray(rng.standard_normal((Tn, D, G)).astype(np.float32) * 0.1)
    c0 = jnp.zeros((Tn, D, G), jnp.float32)

    f = lambda xx: lstm_layer_pallas_merged(xx, hh_w, h0, c0, time_block=4, interpret=True)
    seq = [f(xb[i]) for i in range(B)]

    # broadcast state (the fleet/batcher shape: weights+state closed over)
    vm = jax.vmap(f)(xb)
    for j in range(3):
        np.testing.assert_allclose(
            np.asarray(vm[j]), np.stack([np.asarray(s[j]) for s in seq]), atol=1e-5
        )

    # nested vmap folds into the same row dimension
    vm2 = jax.vmap(jax.vmap(f))(xb.reshape(1, B, Tn, T, D, 4 * G))
    np.testing.assert_allclose(
        np.asarray(vm2[0][0]), np.stack([np.asarray(s[0]) for s in seq]), atol=1e-5
    )


@pytest.mark.slow
def test_full_forward_pallas_matches_scan(cfg_scan, cfg_pallas, params, x):
    st = init_lstm_state(cfg_scan)
    m_scan, st_scan = umx_forward(params, x, st, cfg_scan, "bfloat16")
    m_pal, st_pal = umx_forward(params, x, st, cfg_pallas, "bfloat16")
    denom = np.abs(np.asarray(m_scan)).mean() + 1e-6
    assert np.abs(np.asarray(m_pal) - np.asarray(m_scan)).mean() / denom < 0.02
    np.testing.assert_allclose(np.asarray(st_pal.h), np.asarray(st_scan.h), atol=5e-3)


@pytest.mark.slow
def test_pallas_with_quantized_weights(cfg_pallas, cfg_scan, x):
    """Quantized-HBM params must work through the Pallas forward (ih as
    fused-dequant einsums, hh densified for VMEM residency)."""
    from umx_tpu.io.ggml import read_ggml_bytes, write_ggml_bytes
    from umx_tpu.models.umx import quantized_params_from_ggml, synthetic_state_dicts

    data = write_ggml_bytes(cfg_scan.hidden_size, synthetic_state_dicts(cfg_scan, seed=41))
    model = read_ggml_bytes(data, keep_quantized=True)
    qparams = quantized_params_from_ggml(model, cfg_scan)

    st = init_lstm_state(cfg_scan)
    m_scan, _ = umx_forward(qparams, x, st, cfg_scan)
    m_pal, _ = umx_forward(qparams, x, st, cfg_pallas)
    denom = np.abs(np.asarray(m_scan)).mean() + 1e-6
    assert np.abs(np.asarray(m_pal) - np.asarray(m_scan)).mean() / denom < 0.02


def test_pallas_streaming_carry(cfg_pallas, params, x):
    st0 = init_lstm_state(cfg_pallas)
    _, st1 = umx_forward(params, x, st0, cfg_pallas)
    m2a, _ = umx_forward(params, x, st1, cfg_pallas)
    m2b, _ = umx_forward(params, x, st0, cfg_pallas)
    assert not np.allclose(np.asarray(m2a), np.asarray(m2b))
