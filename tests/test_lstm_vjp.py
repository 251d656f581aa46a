"""Gradient correctness for the merged BLSTM kernel's custom VJP
(ops/lstm_pallas.py): the residual-mode forward + reverse-grid backward
kernels must reproduce autodiff-through-the-scan gradients, so training
can ride the kernel instead of falling back to the lax.scan recurrence
(round-4 VERDICT: "training silently takes the slow scan").

All kernels run in interpret mode on CPU; the primal is asserted
ULP-equal to a bf16-matmul scan transcription, so any gradient
disagreement isolates the backward math (tolerances cover only the
bf16 rounding differences between the hand-written backward — which
keeps the dh chain f32 — and autodiff's bf16-rounded carry).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from umx_tpu.config import ModelConfig
from umx_tpu.ops.lstm_pallas import lstm_layer_pallas_merged_batched


@pytest.fixture(scope="module")
def shapes():
    rng = np.random.default_rng(3)
    B, Tn, T, D, G = 2, 2, 11, 2, 8  # T=11 w/ time_block 4 -> partial block
    mk = lambda *s, a=0.3: jnp.asarray(rng.standard_normal(s), jnp.float32) * a
    return dict(
        B=B, Tn=Tn, T=T, D=D, G=G,
        xp=mk(B, Tn, T, D, 4 * G),
        hh=mk(Tn, D, G, 4 * G),
        h0=mk(B, Tn, D, G, a=0.1),
        c0=mk(B, Tn, D, G, a=0.1),
        wh=mk(B, Tn, T, D, G, a=1.0),
    )


def _ref_scan(xp, hh, h0, c0, B, Tn, T, D, G):
    """Independent scan transcription of the kernel's exact math
    (bf16 h/w matmul with f32 accumulation, f32 gate math)."""

    def chain(xpc, w, h0c, c0c):  # (T, 4G), (G, 4G), (G,), (G,)
        wb = w.astype(jnp.bfloat16)

        def step(carry, x):
            h, c = carry
            rec = jax.lax.dot_general(
                h.astype(jnp.bfloat16)[None], wb,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            )[0]
            gates = x + rec
            i = jax.nn.sigmoid(gates[:G])
            f = jax.nn.sigmoid(gates[G : 2 * G])
            g = jnp.tanh(gates[2 * G : 3 * G])
            o = jax.nn.sigmoid(gates[3 * G :])
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        (hT, cT), hs = jax.lax.scan(step, (h0c, c0c), xpc)
        return hs, hT, cT

    xpf = xp.transpose(0, 1, 3, 2, 4).reshape(B * Tn * D, T, 4 * G)
    hhf = jnp.broadcast_to(
        hh.reshape(1, Tn * D, G, 4 * G), (B, Tn * D, G, 4 * G)
    ).reshape(B * Tn * D, G, 4 * G)
    hs, hT, cT = jax.vmap(chain)(xpf, hhf, h0.reshape(-1, G), c0.reshape(-1, G))
    hs = hs.reshape(B, Tn, D, T, G).transpose(0, 1, 3, 2, 4)
    return hs, hT.reshape(B, Tn, D, G), cT.reshape(B, Tn, D, G)


@pytest.mark.slow
def test_primal_matches_scan(shapes):
    s = shapes
    hs, hT, cT = lstm_layer_pallas_merged_batched(
        s["xp"], s["hh"], s["h0"], s["c0"], time_block=4, interpret=True
    )
    rhs, rhT, rcT = _ref_scan(
        s["xp"], s["hh"], s["h0"], s["c0"],
        s["B"], s["Tn"], s["T"], s["D"], s["G"],
    )
    # a few ULPs of elementwise op-ordering slack (sigmoid/tanh fusion
    # differs between the interpreter and the scan), nothing more
    np.testing.assert_allclose(np.asarray(hs), np.asarray(rhs), atol=1e-6)
    np.testing.assert_allclose(np.asarray(hT), np.asarray(rhT), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cT), np.asarray(rcT), atol=1e-6)


def test_vjp_matches_scan_autodiff(shapes):
    s = shapes
    G = s["G"]

    def loss_k(xp, hh, h0, c0):
        hs, hT, cT = lstm_layer_pallas_merged_batched(
            xp, hh, h0, c0, time_block=4, interpret=True
        )
        return jnp.sum(hs * s["wh"]) + 2.0 * jnp.sum(hT**2) - jnp.sum(cT**3)

    def loss_r(xp, hh, h0, c0):
        hs, hT, cT = _ref_scan(
            xp, hh, h0, c0, s["B"], s["Tn"], s["T"], s["D"], G
        )
        return jnp.sum(hs * s["wh"]) + 2.0 * jnp.sum(hT**2) - jnp.sum(cT**3)

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(s["xp"], s["hh"], s["h0"], s["c0"])
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(s["xp"], s["hh"], s["h0"], s["c0"])
    for name, a, b in zip(("dxp", "dhh", "dh0", "dc0"), gk, gr):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max()
        np.testing.assert_allclose(a, b, atol=0.02 * scale, err_msg=name)
        assert a.dtype == np.float32


@pytest.mark.slow
def test_vjp_even_blocks(shapes):
    """T an exact multiple of the time block (the all-unrolled branch)."""
    s = shapes
    G = s["G"]
    xp8 = s["xp"][:, :, :8]
    wh8 = s["wh"][:, :, :8]

    def loss_k(xp, hh, h0, c0):
        hs, hT, cT = lstm_layer_pallas_merged_batched(
            xp, hh, h0, c0, time_block=4, interpret=True
        )
        return jnp.sum(hs * wh8) + jnp.sum(hT * cT)

    def loss_r(xp, hh, h0, c0):
        hs, hT, cT = _ref_scan(xp, hh, h0, c0, s["B"], s["Tn"], 8, s["D"], G)
        return jnp.sum(hs * wh8) + jnp.sum(hT * cT)

    gk = jax.grad(loss_k, argnums=(0, 1))(xp8, s["hh"], s["h0"], s["c0"])
    gr = jax.grad(loss_r, argnums=(0, 1))(xp8, s["hh"], s["h0"], s["c0"])
    for a, b in zip(gk, gr):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, atol=0.02 * np.abs(b).max())


@pytest.mark.slow
def test_train_step_rides_kernel_and_loss_decreases():
    """End-to-end: mask_loss through the batched kernel recurrence in
    interpret mode — the training composition (value_and_grad over the
    explicitly-batched forward) — takes optimizer steps that reduce the
    loss, matching the scan-path step trajectory."""
    from umx_tpu.models.umx import (
        init_lstm_state,
        synthetic_params,
        umx_forward_batched,
    )

    cfg = ModelConfig(hidden_size=32)
    params = synthetic_params(cfg, seed=0)
    rng = np.random.default_rng(5)
    B, T = 2, 12
    x = jnp.asarray(rng.uniform(0, 1, (B, T, cfg.n_features)), jnp.float32)
    y = jnp.asarray(
        rng.uniform(0, 1, (B, cfg.n_targets, T, cfg.n_outputs)), jnp.float32
    )
    state_b = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (B, *a.shape)), init_lstm_state(cfg)
    )

    def make_loss(impl):
        c = dataclasses.replace(cfg, lstm_impl=impl)

        def loss(p):
            masks, _ = umx_forward_batched(p, x, state_b, c)
            return jnp.mean((masks - y) ** 2)

        return loss

    # CPU: resolve picks scan for "auto"; force the kernel (interpret)
    # path through the private entry to mimic the TPU-resolved trainer
    from umx_tpu.models.umx import _recurrence_pallas_batched, resolve_compute, umx_post, umx_pre

    def loss_kernel(p):
        spec = resolve_compute("default")
        x1 = jax.vmap(lambda xi: umx_pre(p, xi, cfg, spec))(x)
        out, _ = _recurrence_pallas_batched(p, x1, state_b, cfg, spec, interpret=True)
        masks = jax.vmap(lambda a, b: umx_post(p, a, b, cfg, spec))(x1, out)
        return jnp.mean((masks - y) ** 2)

    loss_scan = make_loss("scan")
    l0k, gk = jax.value_and_grad(loss_kernel)(params)
    l0s, gs = jax.value_and_grad(loss_scan)(params)
    np.testing.assert_allclose(l0k, l0s, rtol=1e-5)
    # the gradient wrt the hh weights must agree with the scan path
    a = np.asarray(gk.lstm_hh_w)
    b = np.asarray(gs.lstm_hh_w)
    np.testing.assert_allclose(a, b, atol=0.03 * np.abs(b).max() + 1e-8)

    # a few SGD steps through the kernel reduce the loss
    p = params
    lr = 0.5
    losses = [float(l0k)]
    for _ in range(3):
        l, g = jax.value_and_grad(loss_kernel)(p)
        p = jax.tree.map(lambda w, d: w - lr * d, p, g)
        losses.append(float(loss_kernel(p)))
    assert losses[-1] < losses[0], losses
