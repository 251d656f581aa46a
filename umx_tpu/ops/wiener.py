"""Multichannel Wiener-EM post-filter, fully vectorized for TPU.

Algorithm (reference: src/wiener.cpp:92-425, a port of
``openunmix.filtering.wiener``):

1. initial estimates y_j = target magnitude × mix phase,
2. scale everything down by ``max(1, max|x| / 10)`` for numerical
   stability (wiener.cpp:111-146),
3. per EM iteration: source PSD ``v_j = mean_c |y_j|²``; spatial
   covariance ``R_j(f) = Σ_t y y* / (eps + Σ_t v_j)``; mix covariance
   ``Cxx = reg + Σ_j v_j R_j``; analytic 2×2 complex inverse; gain
   ``G_j = v_j R_j Cxx⁻¹``; new estimate ``y_j(c) = Σ_c' G_j(c,c') x(c')``,
4. scale back up.

The reference runs the covariance/gain nests as scalar loops over
200-frame batches (for memory); here every stage is one einsum over the
whole segment — the (T, F, 2, 2) tensors for a 60 s segment fit HBM
easily.  Two deliberate deviations from the C++ (both toward upstream
openunmix, which defines quality parity):

* PSD is the standard ``|y|² = re² + im²``; the C++ computes ``(re+im)²``
  (wiener.cpp:185-204).  ``WienerConfig.psd = "umxcpp"`` reproduces the
  quirk for A/B comparison.
* the sqrt(eps) diagonal regularization is added once to Cxx, not once
  per source (wiener.cpp:300-325 adds it inside the source loop).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from umx_tpu.config import WienerConfig
from umx_tpu.ops.stft import polar_to_complex

Array = jax.Array


def _invert2x2(m: Array) -> Array:
    """Analytic inverse of (..., 2, 2) complex matrices (wiener.cpp:54-84)."""
    a, b = m[..., 0, 0], m[..., 0, 1]
    c, d = m[..., 1, 0], m[..., 1, 1]
    det = a * d - b * c
    inv_det = jnp.conj(det) / (det.real * det.real + det.imag * det.imag)
    row0 = jnp.stack([d * inv_det, -b * inv_det], axis=-1)
    row1 = jnp.stack([-c * inv_det, a * inv_det], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def wiener_filter(
    mix_stft: Array,
    target_mags: Array,
    cfg: WienerConfig,
) -> Array:
    """EM-refined complex source estimates.

    mix_stft: complex (2, T, F); target_mags: float (S, 2, T, F).
    Returns complex (S, 2, T, F).
    """
    n_sources = target_mags.shape[0]

    # (T, F, C) / (T, F, C, S) layouts for channel-covariance einsums
    x = jnp.transpose(mix_stft, (1, 2, 0))
    y = jnp.transpose(polar_to_complex(target_mags, mix_stft[None]), (2, 3, 1, 0))

    max_abs = jnp.maximum(1.0, jnp.max(jnp.abs(x)) / cfg.scale_factor)
    x = x / max_abs
    y = y / max_abs

    def em_iteration(y):
        # Source PSD v: (T, F, S)
        if cfg.psd == "umxcpp":
            s = y.real + y.imag
            v = jnp.mean(s * s, axis=2)
        else:
            v = jnp.mean(y.real * y.real + y.imag * y.imag, axis=2)

        # Spatial covariance R: (F, S, C, C), time-normalized by Σ_t v
        weight = cfg.eps + jnp.sum(v, axis=0)  # (F, S)
        R = jnp.einsum("tfcs,tfds->fscd", y, jnp.conj(y)) / weight[..., None, None]

        # Mix covariance and its inverse: (T, F, C, C)
        reg = jnp.sqrt(cfg.eps) * jnp.eye(2, dtype=y.dtype)
        Cxx = reg + jnp.einsum("tfs,fscd->tfcd", v, R)
        inv_Cxx = _invert2x2(Cxx)

        # New estimates.  The Wiener gain G_j = v_j R_j Cxx^-1 applied to
        # x factorizes: y_j(c) = v_j Σ_k R_j(c,k) [Cxx^-1 x](k), and
        # z = Cxx^-1 x is SOURCE-INDEPENDENT — computing it once replaces
        # four (T, F, 2, 2) gain materializations with one (T, F, 2)
        # solve-product (≈3x less HBM traffic in the EM update).
        z = jnp.einsum("tfkd,tfd->tfk", inv_Cxx, x)
        y_new = jnp.einsum("fsck,tfk->tfcs", R, z) * v[:, :, None, :]
        return y_new

    for _ in range(cfg.iterations):
        y = em_iteration(y)

    y = y * max_abs
    return jnp.transpose(y, (3, 2, 0, 1)).reshape(n_sources, *mix_stft.shape)
