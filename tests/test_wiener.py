"""Wiener-EM post-filter tests: an independent numpy oracle (direct
transcription of the openunmix EM math that wiener.cpp:92-425 ports),
plus behavioral invariants."""

import dataclasses

import numpy as np
import pytest

from umx_tpu.config import WienerConfig
from umx_tpu.ops.wiener import wiener_filter


def numpy_wiener_oracle(mix, mags, iterations=1, eps=1e-10, scale_factor=10.0, psd="correct"):
    """Straight-line numpy EM, written independently of the JAX version.

    mix: (2, T, F) complex; mags: (S, 2, T, F) float.
    ``psd="umxcpp"`` reproduces the reference's PSD quirk
    (wiener.cpp:185-204: v = mean_c ((re+im))^2 instead of |y|^2).
    """
    S = mags.shape[0]
    T, F = mix.shape[1], mix.shape[2]

    angle = np.angle(mix)  # (2, T, F)
    y = mags * np.exp(1j * angle)[None]  # (S, 2, T, F)

    max_abs = max(1.0, float(np.abs(mix).max()) / scale_factor)
    x = mix / max_abs
    y = y / max_abs

    for _ in range(iterations):
        # PSD: average |y|^2 over channels -> (S, T, F)
        if psd == "umxcpp":
            v = np.mean((y.real + y.imag) ** 2, axis=1)
        else:
            v = np.mean(np.abs(y) ** 2, axis=1)
        # spatial covariance per source: (S, F, 2, 2)
        R = np.zeros((S, F, 2, 2), np.complex128)
        for s in range(S):
            for c1 in range(2):
                for c2 in range(2):
                    R[s, :, c1, c2] = np.sum(y[s, c1] * np.conj(y[s, c2]), axis=0)
            R[s] /= eps + np.sum(v[s], axis=0)[:, None, None]
        # mix covariance (T, F, 2, 2), regularized once
        Cxx = np.sqrt(eps) * np.eye(2)[None, None]
        Cxx = Cxx + np.einsum("stf,sfcd->tfcd", v, R)
        inv = np.linalg.inv(Cxx)
        y_new = np.zeros_like(y)
        for s in range(S):
            gain = np.einsum("fck,tfkd->tfcd", R[s], inv) * v[s][..., None, None]
            # y_s(c) = sum_d gain(c, d) * x(d)
            y_new[s] = np.einsum("tfcd,dtf->ctf", gain, x)
        y = y_new

    return (y * max_abs).astype(np.complex64)


@pytest.fixture()
def spec_data():
    rng = np.random.default_rng(21)
    T, F, S = 12, 33, 4
    mix = (rng.standard_normal((2, T, F)) + 1j * rng.standard_normal((2, T, F))).astype(
        np.complex64
    )
    # plausible masked magnitudes that roughly partition the mix
    masks = rng.uniform(0, 1, (S, 1, T, F)).astype(np.float32)
    masks = masks / masks.sum(0, keepdims=True)
    mags = (masks * np.abs(mix)[None]).astype(np.float32)
    return mix, mags


def test_matches_numpy_oracle(spec_data):
    mix, mags = spec_data
    cfg = WienerConfig()
    ours = np.asarray(wiener_filter(mix, mags, cfg))
    ref = numpy_wiener_oracle(mix, mags, cfg.iterations, cfg.eps, cfg.scale_factor)
    scale = np.abs(mix).max()
    np.testing.assert_allclose(ours, ref, atol=1e-4 * scale, rtol=1e-3)


def test_two_iterations_match_oracle(spec_data):
    mix, mags = spec_data
    cfg = WienerConfig(iterations=2)
    ours = np.asarray(wiener_filter(mix, mags, cfg))
    ref = numpy_wiener_oracle(mix, mags, 2, cfg.eps, cfg.scale_factor)
    scale = np.abs(mix).max()
    np.testing.assert_allclose(ours, ref, atol=1e-4 * scale, rtol=1e-3)


def test_estimates_roughly_partition_mix(spec_data):
    """After one EM pass on estimates that sum to the mix magnitude, the
    summed source estimates should approximate the mix (Wiener gains sum
    to ~identity when sources explain the mixture)."""
    mix, mags = spec_data
    out = np.asarray(wiener_filter(mix, mags, WienerConfig()))
    total = out.sum(axis=0)
    err = np.abs(total - mix).mean() / np.abs(mix).mean()
    assert err < 0.05, err


@pytest.mark.slow
def test_single_dominant_source_takes_mix():
    """If one source's magnitude equals |mix| and the rest are tiny, the
    filter should hand the whole mixture to that source."""
    rng = np.random.default_rng(22)
    T, F = 10, 17
    mix = (rng.standard_normal((2, T, F)) + 1j * rng.standard_normal((2, T, F))).astype(
        np.complex64
    )
    mags = np.full((4, 2, T, F), 1e-6, np.float32)
    mags[2] = np.abs(mix)
    out = np.asarray(wiener_filter(mix, mags, WienerConfig()))
    np.testing.assert_allclose(out[2], mix, atol=2e-3 * np.abs(mix).max())
    assert np.abs(out[[0, 1, 3]]).max() < 1e-3 * np.abs(mix).max()


def test_umxcpp_quirk_matches_oracle(spec_data):
    """The umxcpp PSD quirk path validated against the independent numpy
    oracle carrying the same quirk (round-1 VERDICT: this path was
    smoke-tested only; a regression would have passed CI)."""
    mix, mags = spec_data
    cfg = dataclasses.replace(WienerConfig(), psd="umxcpp")
    ours = np.asarray(wiener_filter(mix, mags, cfg))
    ref = numpy_wiener_oracle(
        mix, mags, cfg.iterations, cfg.eps, cfg.scale_factor, psd="umxcpp"
    )
    scale = np.abs(mix).max()
    np.testing.assert_allclose(ours, ref, atol=1e-4 * scale, rtol=1e-3)
    # and the quirk path must genuinely differ from the correct-PSD path
    correct = np.asarray(wiener_filter(mix, mags, WienerConfig()))
    assert np.abs(ours - correct).max() > 1e-3 * scale


def _planes(mix):
    return mix.real.astype(np.float32), mix.imag.astype(np.float32)


def test_pallas_matches_einsum_one_iteration(spec_data):
    from umx_tpu.ops.wiener import wiener_filter_planes

    mix, mags = spec_data
    cfg_p = dataclasses.replace(WienerConfig(), impl="pallas_interpret", time_block=8)
    xre, xim = _planes(mix)
    yre, yim = wiener_filter_planes(xre, xim, mags, cfg_p)
    ours = np.asarray(yre) + 1j * np.asarray(yim)
    ref = numpy_wiener_oracle(mix, mags, 1, cfg_p.eps, cfg_p.scale_factor)
    scale = np.abs(mix).max()
    np.testing.assert_allclose(ours, ref, atol=1e-4 * scale, rtol=1e-3)


@pytest.mark.slow
def test_pallas_matches_einsum_two_iterations(spec_data):
    from umx_tpu.ops.wiener import wiener_filter_planes

    mix, mags = spec_data
    cfg_p = dataclasses.replace(
        WienerConfig(iterations=2), impl="pallas_interpret", time_block=8
    )
    xre, xim = _planes(mix)
    yre, yim = wiener_filter_planes(xre, xim, mags, cfg_p)
    ours = np.asarray(yre) + 1j * np.asarray(yim)
    ref = numpy_wiener_oracle(mix, mags, 2, cfg_p.eps, cfg_p.scale_factor)
    scale = np.abs(mix).max()
    np.testing.assert_allclose(ours, ref, atol=1e-4 * scale, rtol=1e-3)


@pytest.mark.slow
def test_pallas_bf16_output_dtype(spec_data):
    """out_dtype='bfloat16' emits bf16 y planes from the FINAL apply
    only (write-bandwidth trade, WienerConfig.out_dtype); values match
    the f32 path within bf16 rounding."""
    import jax.numpy as jnp

    from umx_tpu.ops.wiener import wiener_filter_planes

    mix, mags = spec_data
    for iters in (1, 2):
        cfg_p = dataclasses.replace(
            WienerConfig(iterations=iters),
            impl="pallas_interpret",
            time_block=8,
            out_dtype="bfloat16",
        )
        xre, xim = _planes(mix)
        yre, yim = wiener_filter_planes(xre, xim, mags, cfg_p)
        assert yre.dtype == jnp.bfloat16 and yim.dtype == jnp.bfloat16
        cfg_f = dataclasses.replace(cfg_p, out_dtype="float32")
        fre, fim = wiener_filter_planes(xre, xim, mags, cfg_f)
        assert fre.dtype == jnp.float32
        scale = float(np.abs(mix).max())
        np.testing.assert_allclose(
            np.asarray(yre, np.float32), np.asarray(fre),
            atol=1e-2 * scale,
        )


@pytest.mark.slow
def test_pallas_padding_shapes():
    # T and F far from lane/block multiples; padded bins must come back 0-free
    from umx_tpu.ops.wiener import wiener_filter, wiener_filter_planes

    rng = np.random.default_rng(23)
    T, F, S = 37, 200, 4
    mix = (rng.standard_normal((2, T, F)) + 1j * rng.standard_normal((2, T, F))).astype(
        np.complex64
    )
    mags = rng.uniform(0, 1, (S, 2, T, F)).astype(np.float32)
    cfg_p = dataclasses.replace(WienerConfig(), impl="pallas_interpret", time_block=16)
    yre, yim = wiener_filter_planes(mix.real.copy(), mix.imag.copy(), mags, cfg_p)
    ours = np.asarray(yre) + 1j * np.asarray(yim)
    assert ours.shape == (S, 2, T, F)
    ref = np.asarray(wiener_filter(mix, mags, WienerConfig()))
    scale = np.abs(mix).max()
    np.testing.assert_allclose(ours, ref, atol=1e-4 * scale, rtol=1e-3)


def test_planes_dispatcher_einsum_fallback(spec_data):
    # quirk PSD must route to the einsum path and agree with the complex API
    from umx_tpu.ops.wiener import wiener_filter, wiener_filter_planes

    mix, mags = spec_data
    cfg = dataclasses.replace(WienerConfig(), psd="umxcpp", impl="pallas")
    yre, yim = wiener_filter_planes(mix.real.copy(), mix.imag.copy(), mags, cfg)
    ref = np.asarray(wiener_filter(mix, mags, cfg))
    np.testing.assert_allclose(np.asarray(yre) + 1j * np.asarray(yim), ref, atol=1e-6)


@pytest.mark.slow
def test_pallas_from_masks_matches_oracle(spec_data):
    # the segment-pipeline hot path: masks in network layout, initial
    # estimate y = mask * x formed in-kernel
    from umx_tpu.ops.wiener import wiener_filter_masks

    mix, mags = spec_data
    S, _, T, F = mags.shape
    mag = np.abs(mix)
    # network-layout masks consistent with the target magnitudes
    masks = (mags / np.maximum(mag[None], 1e-12)).transpose(0, 2, 1, 3).reshape(S, T, 2 * F)
    cfg_p = dataclasses.replace(WienerConfig(), impl="pallas_interpret", time_block=8)
    yre, yim = wiener_filter_masks(
        mix.real.copy(), mix.imag.copy(), masks.astype(np.float32), F, cfg_p
    )
    ours = np.asarray(yre) + 1j * np.asarray(yim)
    ref = numpy_wiener_oracle(mix, (masks.reshape(S, T, 2, F).transpose(0, 2, 1, 3) * mag[None]).astype(np.float32),
                              1, cfg_p.eps, cfg_p.scale_factor)
    scale = np.abs(mix).max()
    np.testing.assert_allclose(ours, ref, atol=1e-4 * scale, rtol=1e-3)


@pytest.mark.slow
def test_pallas_from_masks_two_iterations(spec_data):
    from umx_tpu.ops.wiener import wiener_filter_masks

    mix, mags = spec_data
    S, _, T, F = mags.shape
    mag = np.abs(mix)
    masks = (mags / np.maximum(mag[None], 1e-12)).transpose(0, 2, 1, 3).reshape(S, T, 2 * F)
    cfg_p = dataclasses.replace(
        WienerConfig(iterations=2), impl="pallas_interpret", time_block=8
    )
    yre, yim = wiener_filter_masks(
        mix.real.copy(), mix.imag.copy(), masks.astype(np.float32), F, cfg_p
    )
    ours = np.asarray(yre) + 1j * np.asarray(yim)
    tm = (masks.reshape(S, T, 2, F).transpose(0, 2, 1, 3) * mag[None]).astype(np.float32)
    ref = numpy_wiener_oracle(mix, tm, 2, cfg_p.eps, cfg_p.scale_factor)
    scale = np.abs(mix).max()
    np.testing.assert_allclose(ours, ref, atol=1e-4 * scale, rtol=1e-3)


@pytest.mark.slow
def test_pallas_from_masks_vmap_batches():
    # demix_fused_parallel / the serving batcher vmap the segment program
    # over chunks — the pallas calls must compose with vmap
    import jax

    from umx_tpu.ops.wiener import wiener_filter_masks

    rng = np.random.default_rng(31)
    B, S, T, F = 3, 4, 24, 257
    xre = rng.standard_normal((B, 2, T, F)).astype(np.float32)
    xim = rng.standard_normal((B, 2, T, F)).astype(np.float32)
    masks = rng.uniform(0, 1, (B, S, T, 2 * F)).astype(np.float32)
    cfg = dataclasses.replace(WienerConfig(), impl="pallas_interpret", time_block=8)
    yre, yim = jax.vmap(lambda a, b, m: wiener_filter_masks(a, b, m, F, cfg))(
        xre, xim, masks
    )
    solo = wiener_filter_masks(xre[1], xim[1], masks[1], F, cfg)
    np.testing.assert_allclose(np.asarray(yre[1]), np.asarray(solo[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(yim[1]), np.asarray(solo[1]), atol=1e-5)


@pytest.mark.slow
def test_pallas_from_masks_time_block_invariant(spec_data):
    # time_block only changes the kernels' grid blocking (and the f32
    # racc summation order); the result must be block-size invariant.
    # Guards the perf-swept default (scripts/wiener_block_sweep.py) —
    # any tb the sweep picks has to be a pure scheduling choice.
    from umx_tpu.ops.wiener import wiener_filter_masks

    mix, mags = spec_data
    S, _, T, F = mags.shape
    mag = np.abs(mix)
    masks = (
        (mags / np.maximum(mag[None], 1e-12))
        .transpose(0, 2, 1, 3)
        .reshape(S, T, 2 * F)
        .astype(np.float32)
    )
    outs = []
    for tb in (8, 16, 64):
        cfg = dataclasses.replace(
            WienerConfig(), impl="pallas_interpret", time_block=tb
        )
        yre, yim = wiener_filter_masks(mix.real.copy(), mix.imag.copy(), masks, F, cfg)
        outs.append(np.asarray(yre) + 1j * np.asarray(yim))
    scale = np.abs(mix).max()
    for o in outs[1:]:
        np.testing.assert_allclose(o, outs[0], atol=1e-5 * scale, rtol=1e-5)
