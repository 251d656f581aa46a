"""Quantized-HBM fused-dequant tests: the algebraic fusion
x@(s*q+o) = s*(x@q) + o*rowsum(x) must be exact vs dequantize-then-
matmul (u8 and split-u16 byte planes are exact bf16 integers), and the
full quantized forward must track the dequantized forward."""

import jax.numpy as jnp
import numpy as np
import pytest

from umx_tpu.config import EngineConfig, ModelConfig, SegmentConfig
from umx_tpu.io.ggml import read_ggml_bytes, write_ggml_bytes
from umx_tpu.models.umx import (
    init_lstm_state,
    params_from_ggml,
    quantized_params_from_ggml,
    synthetic_state_dicts,
    umx_forward,
)
from umx_tpu.ops.qmatmul import QTensor, q_mm, qtensor_from_raw
from umx_tpu.ops.quant import dequantize, quantize


@pytest.fixture(scope="module")
def cfg():
    return ModelConfig(hidden_size=64)


@pytest.fixture(scope="module")
def model(cfg):
    data = write_ggml_bytes(cfg.hidden_size, synthetic_state_dicts(cfg, seed=5))
    return read_ggml_bytes(data, keep_quantized=True)


@pytest.mark.parametrize("qtype", [np.uint8, np.uint16])
def test_q_mm_exact_vs_bf16_dequant(qtype):
    """q_mm must equal matmul against the bf16-cast dequantized matrix
    exactly in structure: same math, exact integer planes."""
    rng = np.random.default_rng(101)
    W = rng.standard_normal((64, 48)).astype(np.float32)
    q, scale, offset = quantize(W, qtype)
    qt = qtensor_from_raw(q, scale, offset)

    x = rng.standard_normal((10, 64)).astype(np.float32)
    got = np.asarray(q_mm(jnp.asarray(x), qt))

    W_deq = dequantize(q, scale, offset)
    ref_f32 = x @ W_deq
    # error bounded by x's bf16 input cast (~2^-9/element, random-sign
    # accumulation over K=64 -> ~1% of the mean magnitude)
    denom = np.abs(ref_f32).mean()
    assert np.abs(got - ref_f32).mean() / denom < 2e-2

    # and exactly equal to the same algebra computed in f64: bf16(x) for
    # the integer contraction, full-precision x for the offset rowsum
    xb = np.asarray(jnp.asarray(x, jnp.bfloat16).astype(jnp.float32))
    ref_exact = scale * (xb @ q.astype(np.float64)) + offset * x.sum(-1, keepdims=True)
    np.testing.assert_allclose(got, ref_exact, rtol=1e-5, atol=1e-3 * denom)


def test_u16_planes_are_exact():
    rng = np.random.default_rng(102)
    W = rng.standard_normal((32, 32)).astype(np.float32)
    q, scale, offset = quantize(W, np.uint16)
    qt = qtensor_from_raw(q, scale, offset)
    assert len(qt.planes) == 2
    hi = np.asarray(qt.planes[0].astype(jnp.float32))
    lo = np.asarray(qt.planes[1].astype(jnp.float32))
    np.testing.assert_array_equal(256 * hi + lo, q.astype(np.float32))


def test_quantized_params_structure(cfg, model):
    p = quantized_params_from_ggml(model, cfg)
    assert isinstance(p.fc1_w, QTensor)
    assert len(p.fc1_w.planes) == 1  # u8
    assert len(p.fc2_w.planes) == 2  # u16
    assert len(p.fc3_w.planes) == 2  # u16
    assert isinstance(p.lstm_ih_w, QTensor)
    assert p.lstm_ih_w.shape == (4, 3, 2, cfg.hidden_size, 2 * cfg.hidden_size)
    assert p.lstm_ih_w.scale.shape == (4, 3, 2)
    # small tensors stay dense float32
    assert not isinstance(p.bn1_w, QTensor)
    assert not isinstance(p.input_mean, QTensor)


@pytest.mark.slow
def test_quantized_forward_tracks_dequantized(cfg, model):
    rng = np.random.default_rng(103)
    x = (np.abs(rng.standard_normal((40, cfg.n_features))) * 0.3).astype(np.float32)
    st = init_lstm_state(cfg)

    dense = params_from_ggml(model, cfg)
    quant = quantized_params_from_ggml(model, cfg)

    m_dense, _ = umx_forward(dense, jnp.asarray(x), st, cfg, "bfloat16")
    m_quant, _ = umx_forward(quant, jnp.asarray(x), st, cfg)
    m_dense, m_quant = np.asarray(m_dense), np.asarray(m_quant)
    denom = np.abs(m_dense).mean() + 1e-6
    rel = np.abs(m_quant - m_dense).mean() / denom
    assert rel < 0.02, rel


def test_quantized_segment_forward_runs(cfg, model):
    from umx_tpu.engine.separator import segment_forward

    ecfg = EngineConfig(model=cfg, segment=SegmentConfig(segment_secs=0.5))
    n = ecfg.segment.segment_samples(44100)
    quant = quantized_params_from_ggml(model, cfg)
    rng = np.random.default_rng(104)
    audio = jnp.asarray(rng.uniform(-0.5, 0.5, (2, n)).astype(np.float32))
    out, _ = segment_forward(quant, audio, init_lstm_state(cfg), ecfg, n)
    assert np.isfinite(np.asarray(out)).all()
