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


def wiener_filter(
    mix_stft: Array,
    target_mags: Array,
    cfg: WienerConfig,
) -> Array:
    """EM-refined complex source estimates.

    mix_stft: complex (2, T, F); target_mags: float (S, 2, T, F).
    Returns complex (S, 2, T, F).

    Layout note: everything stays in (..., T, F) with the frequency axis
    minor — F=2049 fills the TPU's 128-wide lanes, whereas the naive
    (T, F, channel, source) layout puts a size-2/4 axis in the lanes and
    wastes 32-64x of every elementwise op.  The channel/source axes live
    as leading (mapped) dimensions; the tiny 2x2 channel algebra is
    unrolled.
    """
    # (S, C, T, F) — the natural input layout, kept throughout
    x = mix_stft  # (C, T, F)
    y = polar_to_complex(target_mags, mix_stft[None])  # (S, C, T, F)

    max_abs = jnp.maximum(1.0, jnp.max(jnp.abs(x)) / cfg.scale_factor)
    x = x / max_abs
    y = y / max_abs

    def em_iteration(y):
        # Source PSD v: (S, T, F)
        if cfg.psd == "umxcpp":
            s = y.real + y.imag
            v = jnp.mean(s * s, axis=1)
        else:
            v = jnp.mean(y.real * y.real + y.imag * y.imag, axis=1)

        # Spatial covariance R: (S, C, C', F), time-normalized by Σ_t v
        weight = cfg.eps + jnp.sum(v, axis=1)  # (S, F)
        R = jnp.einsum("sctf,sdtf->scdf", y, jnp.conj(y)) / weight[:, None, None, :]

        # Mix covariance Cxx (C, C', T, F) = reg·I + Σ_s v_s R_s
        reg = jnp.sqrt(cfg.eps)
        Cxx = jnp.einsum("stf,scdf->cdtf", v, R)
        Cxx = Cxx.at[0, 0].add(reg).at[1, 1].add(reg)

        # analytic 2x2 inverse, unrolled on (T, F) planes
        # (wiener.cpp:54-84)
        a, b, c, d = Cxx[0, 0], Cxx[0, 1], Cxx[1, 0], Cxx[1, 1]
        det = a * d - b * c
        inv_det = jnp.conj(det) / (det.real * det.real + det.imag * det.imag)
        inv = jnp.stack(
            [
                jnp.stack([d * inv_det, -b * inv_det]),
                jnp.stack([-c * inv_det, a * inv_det]),
            ]
        )  # (K, D, T, F)

        # z = Cxx^-1 x is SOURCE-INDEPENDENT: the Wiener gain
        # G_j = v_j R_j Cxx^-1 applied to x factorizes as
        # y_j(c) = v_j Σ_k R_j(c,k) z(k), avoiding per-source gain
        # matrices entirely.
        z = jnp.einsum("kdtf,dtf->ktf", inv, x)
        y_new = jnp.einsum("sckf,ktf->sctf", R, z) * v[:, None]
        return y_new

    for _ in range(cfg.iterations):
        y = em_iteration(y)

    return y * max_abs


def _pallas_eligible(cfg: WienerConfig) -> bool:
    if cfg.psd != "correct":
        return False  # the umxcpp PSD quirk lives on the einsum path only
    if cfg.iterations < 1:
        return False  # iterations=0 = raw mask estimates; einsum handles it
    if cfg.impl in ("pallas", "pallas_interpret"):
        return True
    return cfg.impl == "auto" and jax.default_backend() not in ("cpu",)


def _resolve_out_dtype(cfg: WienerConfig):
    odt = getattr(cfg, "out_dtype", "auto")
    if odt == "auto":
        # bf16 y halves the apply kernel's dominant write traffic; its
        # ~-58 dB output noise matches the TPU path's accepted class
        # (PARITY.md wiener_bf16 row).  CPU keeps f32 (tests/oracles).
        on_tpu = jax.default_backend() not in ("cpu",)
        return jnp.bfloat16 if on_tpu else jnp.float32
    return jnp.dtype(odt)


def wiener_filter_planes(
    xre: Array,
    xim: Array,
    target_mags: Array,
    cfg: WienerConfig,
) -> tuple[Array, Array]:
    """Planes-form Wiener filter: (2, T, F) mix re/im + (S, 2, T, F) mags
    → (yre, yim) each (S, 2, T, F) float32.

    Dispatches to the fused Pallas kernels (ops/wiener_pallas.py) per
    ``cfg.impl``; the einsum fallback wraps :func:`wiener_filter`.
    Keeping the pipeline in real planes end to end (STFT → mask → Wiener
    → iSTFT) removes every complex64 interleave/deinterleave pass.
    """
    if _pallas_eligible(cfg):
        from umx_tpu.ops.wiener_pallas import wiener_planes_pallas

        return wiener_planes_pallas(
            xre,
            xim,
            target_mags,
            cfg,
            time_block=cfg.time_block,
            interpret=cfg.impl == "pallas_interpret",
            out_dtype=_resolve_out_dtype(cfg),
        )
    y = wiener_filter(jax.lax.complex(xre, xim), target_mags, cfg)
    return y.real, y.imag


def wiener_filter_masks(
    xre: Array,
    xim: Array,
    masks: Array,
    n_bins: int,
    cfg: WienerConfig,
) -> tuple[Array, Array]:
    """Wiener filter fed the NETWORK-LAYOUT masks (S, T, 2*n_bins) — the
    segment-pipeline hot path.  On the Pallas path this skips the
    (S, 2, T, F) target-magnitude materialization entirely (the initial
    estimate is y = mask * x); the einsum fallback reconstructs the
    magnitudes and behaves identically."""
    if _pallas_eligible(cfg):
        from umx_tpu.ops.wiener_pallas import wiener_planes_from_masks

        return wiener_planes_from_masks(
            xre,
            xim,
            masks,
            n_bins,
            cfg,
            time_block=cfg.time_block,
            interpret=cfg.impl == "pallas_interpret",
            out_dtype=_resolve_out_dtype(cfg),
        )
    from umx_tpu.engine.separator import masks_to_planes

    m = masks_to_planes(masks, n_bins)
    mag = jnp.sqrt(xre * xre + xim * xim)
    y = wiener_filter(jax.lax.complex(xre, xim), m * mag[None], cfg)
    return y.real, y.imag
