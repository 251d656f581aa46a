"""Pallas TPU kernels for the multichannel Wiener-EM post-filter.

The einsum formulation (ops/wiener.py) is algebraically tight but forces
XLA to materialize every intermediate of the chain — initial complex
estimates y = mag*unit(x) (340 MB at a 60 s segment), scaled copies,
per-stage einsum outputs — so the stage is HBM-bound at ~6x more traffic
than the math needs.  These kernels collapse one EM iteration into two
passes (reference semantics: wiener.cpp:92-425, one iteration by default,
wiener.hpp:13):

* **reduce** — one sweep over time blocks accumulating the per-source
  spatial-covariance statistics R_acc(s, f) = sum_t y y* (packed as 4 real
  planes per source: R00, R11, Re R01, Im R01 — R is 2x2 Hermitian).  For
  the FIRST iteration the initial estimates never exist in memory: since
  y = mag * unit(x), the kernel reads the mask magnitudes and the mix
  spectrogram directly (|y|^2 = mag^2, y_c y_d* = mag_c mag_d u_c u_d*).
* **apply** — one sweep computing, per (t, f): source PSDs v_s, the mix
  covariance Cxx = sum_s v_s R_s + reg*I, its analytic Hermitian 2x2
  inverse, z = Cxx^-1 x (source-independent factorization), and the new
  estimates y_sc = v_s (R_s[c,0] z0 + R_s[c,1] z1).

Everything is real-pair arithmetic on (time_block, F) planes — F rides
the lanes as a full-dimension block (no padding).  Iterations >= 2 use
the same kernels reading the previous iteration's y planes.  Block sizes
are deliberately small (see WienerConfig.time_block): a large scoped-VMEM
footprint makes XLA evict the surrounding LSTM scans' VMEM-resident
weights, costing far more than the kernels themselves.

Traffic per EM-1 segment: reduce reads mags+x once (~255 MB), apply reads
them again and writes y (~595 MB) — ~0.9 GB total vs ~5+ GB for the
einsum chain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from umx_tpu.config import WienerConfig
from umx_tpu.ops.stft import unit_phasors as _unit_phasors

Array = jax.Array

_LANES = 128


def _vmem_limit(K: int, F: int, S: int, mask_bytes: int, out_bytes: int) -> int:
    """Scoped-VMEM budget for one grid step of the reduce/apply pair.

    Sized from the double-buffered block footprint (x planes f32, mask
    planes in their storage dtype, y outputs in ``out_dtype``) plus
    working-vreg slack, clamped to [16 MB, 96 MB] (the chip's scoped
    hard limit is ~96 MB — PERF.md "composition saga").  Keeping the
    limit proportional to ``time_block`` lets the block-size knob be
    swept without hand-editing the budget; the historical 16 MB floor
    preserved the round-2 eviction fix at the default block size.

    Dims are padded to the Mosaic tile grid (lanes 128, sublanes 8)
    before sizing, and the sum carries a 25% scratch factor: the first
    block-sweep run (round 4) hit Mosaic's compile-time stack check at
    tb=64 — 26.65 MB actual vs a 24.01 MB unpadded-model budget —
    because lane padding (2049 -> 2176) and kernel-internal temporaries
    are real VMEM the linear model ignored."""
    Kp = -(-K // 8) * 8
    Fp = -(-F // _LANES) * _LANES
    x_blk = 2 * 2 * Kp * Fp * 4          # xre + xim refs
    m_blk = 2 * S * Kp * Fp * mask_bytes  # two mask-channel (or y) refs
    y_blk = 2 * S * 2 * Kp * Fp * out_bytes
    per_step = 2 * (x_blk + m_blk + y_blk)  # double-buffered pipeline
    slack = 8 * 1024 * 1024
    budget = per_step + per_step // 4 + slack
    return max(16 * 1024 * 1024, min(96 * 1024 * 1024, budget))


def _pad_to(x: Array, axis: int, mult: int) -> Array:
    size = x.shape[axis]
    pad = (-size) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _make_reduce_kernel_masks(n_sources: int):
    """Reduce variant reading the NETWORK-LAYOUT masks (S, K, 2, F) —
    no transpose, no magnitude materialization: the initial estimate is
    algebraically y = mask * x (mag*unit(x) = mask*|x|*x/|x|), so the
    statistics only need masks and the mix planes."""

    def kernel(xre_ref, xim_ref, m0_ref, m1_ref, scale_ref, racc_ref):
        inv = scale_ref[0, 0]
        sq = inv * inv
        ax0 = xre_ref[0] * xre_ref[0] + xim_ref[0] * xim_ref[0]
        ax1 = xre_ref[1] * xre_ref[1] + xim_ref[1] * xim_ref[1]
        # cross terms of x0 * conj(x1)
        cr = xre_ref[0] * xre_ref[1] + xim_ref[0] * xim_ref[1]
        ci = xim_ref[0] * xre_ref[1] - xre_ref[0] * xim_ref[1]
        rows = []
        for s in range(n_sources):
            # per-channel mask planes arrive as SEPARATE refs (possibly
            # bf16, EngineConfig.mask_dtype): indexing only the leading
            # source dim keeps zero-offset layouts, which Mosaic's
            # reduce requires (a packed (K, 2, F) channel slice at
            # index 1 carries a sublane offset it rejects)
            m0 = m0_ref[s].astype(jnp.float32)
            m1 = m1_ref[s].astype(jnp.float32)
            m01 = m0 * m1
            rows.append(jnp.sum(m0 * m0 * ax0, axis=0, keepdims=True) * sq)
            rows.append(jnp.sum(m1 * m1 * ax1, axis=0, keepdims=True) * sq)
            rows.append(jnp.sum(m01 * cr, axis=0, keepdims=True) * sq)
            rows.append(jnp.sum(m01 * ci, axis=0, keepdims=True) * sq)
        partial = jnp.concatenate(rows, axis=0)

        @pl.when(pl.program_id(0) == 0)
        def _():
            racc_ref[:] = jnp.zeros_like(racc_ref)

        racc_ref[:] += partial

    return kernel


def _make_apply_kernel_masks(n_sources: int, eps: float, reg: float):
    """Apply variant with PSD from masks: v_s = mean_c (mask_sc |x_c|)^2."""

    def kernel(xre_ref, xim_ref, m0_ref, m1_ref, racc_ref, scale_ref, yre_ref, yim_ref):
        inv_ma = scale_ref[0, 0]
        sq = inv_ma * inv_ma
        ax0 = xre_ref[0] * xre_ref[0] + xim_ref[0] * xim_ref[0]
        ax1 = xre_ref[1] * xre_ref[1] + xim_ref[1] * xim_ref[1]

        def v_of(s):
            m0 = m0_ref[s].astype(jnp.float32)  # per-channel refs (see reduce)
            m1 = m1_ref[s].astype(jnp.float32)
            return 0.5 * sq * (m0 * m0 * ax0 + m1 * m1 * ax1)

        _apply_common(xre_ref, xim_ref, v_of, racc_ref, inv_ma, yre_ref, yim_ref,
                      n_sources, eps, reg)

    return kernel


def _make_reduce_kernel(n_sources: int, from_mags: bool):
    def accumulate(y_planes, racc_ref, b):
        rows = []
        for s in range(n_sources):
            yre0, yim0, yre1, yim1 = y_planes(s)
            r00 = jnp.sum(yre0 * yre0 + yim0 * yim0, axis=0, keepdims=True)
            r11 = jnp.sum(yre1 * yre1 + yim1 * yim1, axis=0, keepdims=True)
            r01re = jnp.sum(yre0 * yre1 + yim0 * yim1, axis=0, keepdims=True)
            r01im = jnp.sum(yim0 * yre1 - yre0 * yim1, axis=0, keepdims=True)
            rows.extend([r00, r11, r01re, r01im])
        partial = jnp.concatenate(rows, axis=0)  # (4*S, F)

        @pl.when(b == 0)
        def _():
            racc_ref[:] = jnp.zeros_like(racc_ref)

        racc_ref[:] += partial

    if from_mags:

        def kernel(xre_ref, xim_ref, mag_ref, scale_ref, racc_ref):
            inv_ma = scale_ref[0, 0]
            ure0, uim0 = _unit_phasors(xre_ref[0], xim_ref[0])
            ure1, uim1 = _unit_phasors(xre_ref[1], xim_ref[1])

            def y_planes(s):
                m0 = mag_ref[s, 0] * inv_ma
                m1 = mag_ref[s, 1] * inv_ma
                return m0 * ure0, m0 * uim0, m1 * ure1, m1 * uim1

            accumulate(y_planes, racc_ref, pl.program_id(0))

    else:

        def kernel(yre_ref, yim_ref, racc_ref):
            def y_planes(s):
                return yre_ref[s, 0], yim_ref[s, 0], yre_ref[s, 1], yim_ref[s, 1]

            accumulate(y_planes, racc_ref, pl.program_id(0))

    return kernel


def _apply_common(xre_ref, xim_ref, v_of, racc_ref, inv_ma, yre_ref, yim_ref,
                  n_sources: int, eps: float, reg: float):
    x0re = xre_ref[0] * inv_ma
    x0im = xim_ref[0] * inv_ma
    x1re = xre_ref[1] * inv_ma
    x1im = xim_ref[1] * inv_ma

    vs, r00s, r11s, r01res, r01ims = [], [], [], [], []
    c00 = jnp.full_like(x0re, reg)
    c11 = jnp.full_like(x0re, reg)
    c01re = jnp.zeros_like(x0re)
    c01im = jnp.zeros_like(x0re)
    for s in range(n_sources):
        racc = racc_ref[4 * s : 4 * s + 4]  # (4, F); rows kept 2D
        w = eps + 0.5 * (racc[0:1] + racc[1:2])  # sum_t v_s, (1, F)
        inv_w = 1.0 / w
        r00 = racc[0:1] * inv_w  # (1, F), broadcast over time rows
        r11 = racc[1:2] * inv_w
        r01re = racc[2:3] * inv_w
        r01im = racc[3:4] * inv_w
        v = v_of(s)
        c00 += v * r00
        c11 += v * r11
        c01re += v * r01re
        c01im += v * r01im
        vs.append(v)
        r00s.append(r00)
        r11s.append(r11)
        r01res.append(r01re)
        r01ims.append(r01im)

    # Hermitian 2x2 inverse: det is real
    det = c00 * c11 - (c01re * c01re + c01im * c01im)
    idet = 1.0 / det
    # z = Cxx^-1 x  (source-independent)
    z0re = (c11 * x0re - (c01re * x1re - c01im * x1im)) * idet
    z0im = (c11 * x0im - (c01re * x1im + c01im * x1re)) * idet
    z1re = (c00 * x1re - (c01re * x0re + c01im * x0im)) * idet
    z1im = (c00 * x1im - (c01re * x0im - c01im * x0re)) * idet

    ma = 1.0 / inv_ma
    odt = yre_ref.dtype  # f32, or bf16 when the caller trades write
    # bandwidth for ~-58 dB output noise (WienerConfig.out_dtype)
    for s in range(n_sources):
        v = vs[s] * ma
        r00, r11 = r00s[s], r11s[s]
        r01re, r01im = r01res[s], r01ims[s]
        # y_s0 = v (R00 z0 + R01 z1); y_s1 = v (conj(R01) z0 + R11 z1)
        yre_ref[s, 0] = (v * (r00 * z0re + r01re * z1re - r01im * z1im)).astype(odt)
        yim_ref[s, 0] = (v * (r00 * z0im + r01re * z1im + r01im * z1re)).astype(odt)
        yre_ref[s, 1] = (v * (r01re * z0re + r01im * z0im + r11 * z1re)).astype(odt)
        yim_ref[s, 1] = (v * (r01re * z0im - r01im * z0re + r11 * z1im)).astype(odt)


def _make_apply_kernel(n_sources: int, from_mags: bool, eps: float, reg: float):
    if from_mags:

        def kernel(xre_ref, xim_ref, mag_ref, racc_ref, scale_ref, yre_ref, yim_ref):
            inv_ma = scale_ref[0, 0]
            sq = inv_ma * inv_ma

            def v_of(s):
                m0 = mag_ref[s, 0]
                m1 = mag_ref[s, 1]
                return 0.5 * sq * (m0 * m0 + m1 * m1)

            _apply_common(xre_ref, xim_ref, v_of, racc_ref, inv_ma, yre_ref, yim_ref,
                          n_sources, eps, reg)

    else:

        def kernel(
            xre_ref, xim_ref, yre_in_ref, yim_in_ref, racc_ref, scale_ref, yre_ref, yim_ref
        ):
            inv_ma = scale_ref[0, 0]

            def v_of(s):
                a = yre_in_ref[s, 0]
                b = yim_in_ref[s, 0]
                c = yre_in_ref[s, 1]
                d = yim_in_ref[s, 1]
                return 0.5 * (a * a + b * b + c * c + d * d)

            _apply_common(xre_ref, xim_ref, v_of, racc_ref, inv_ma, yre_ref, yim_ref,
                          n_sources, eps, reg)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("cfg", "time_block", "interpret", "out_dtype")
)
def wiener_planes_pallas(
    xre: Array,
    xim: Array,
    target_mags: Array,
    cfg: WienerConfig,
    time_block: int = 8,
    interpret: bool = False,
    out_dtype=jnp.float32,
) -> tuple[Array, Array]:
    """EM-refined source estimates as (re, im) planes.

    xre/xim: (2, T, F) float32 mix spectrogram planes;
    target_mags: (S, 2, T, F) float32.  Returns (yre, yim) each
    (S, 2, T, F) in ``out_dtype`` (the FINAL apply's store dtype —
    intermediate EM iterations always stay float32).  Implements
    ``psd="correct"`` semantics only (the einsum path keeps the umxcpp
    PSD-quirk A/B flag).
    """
    S, C, T, F = target_mags.shape
    assert C == 2, "wiener kernels are specialized to stereo"

    max_abs = jnp.maximum(1.0, jnp.max(jnp.sqrt(xre * xre + xim * xim)) / cfg.scale_factor)
    inv_ma = (1.0 / max_abs).reshape(1, 1).astype(jnp.float32)

    # no frequency padding (full-dimension F blocks); small blocks +
    # tight vmem_limit so the call never evicts neighbors' VMEM (see
    # wiener_planes_from_masks docstring)
    xre_p = _pad_to(xre.astype(jnp.float32), -2, time_block)
    xim_p = _pad_to(xim.astype(jnp.float32), -2, time_block)
    mags_p = _pad_to(target_mags.astype(jnp.float32), -2, time_block)
    Tp = xre_p.shape[-2]
    K = min(time_block, Tp)
    n_blocks = Tp // K
    reg = float(cfg.eps) ** 0.5

    x_spec = pl.BlockSpec((2, K, F), lambda b: (0, b, 0), memory_space=pltpu.VMEM)
    y_spec = pl.BlockSpec((S, 2, K, F), lambda b: (0, 0, b, 0), memory_space=pltpu.VMEM)
    racc_spec = pl.BlockSpec((4 * S, F), lambda b: (0, 0), memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM)
    racc_shape = jax.ShapeDtypeStruct((4 * S, F), jnp.float32)
    y_shape = jax.ShapeDtypeStruct((S, 2, Tp, F), jnp.float32)
    y_shape_out = jax.ShapeDtypeStruct((S, 2, Tp, F), out_dtype)
    params = pltpu.CompilerParams(
        vmem_limit_bytes=_vmem_limit(K, F, S, 4, jnp.dtype(out_dtype).itemsize)
    )

    def reduce_mags(xre_p, xim_p, mags_p):
        return pl.pallas_call(
            _make_reduce_kernel(S, from_mags=True),
            grid=(n_blocks,),
            in_specs=[x_spec, x_spec, y_spec, scale_spec],
            out_specs=racc_spec,
            out_shape=racc_shape,
            compiler_params=params,
            interpret=interpret,
        )(xre_p, xim_p, mags_p, inv_ma)

    def reduce_y(yre, yim):
        return pl.pallas_call(
            _make_reduce_kernel(S, from_mags=False),
            grid=(n_blocks,),
            in_specs=[y_spec, y_spec],
            out_specs=racc_spec,
            out_shape=racc_shape,
            compiler_params=params,
            interpret=interpret,
        )(yre, yim)

    def apply_mags(racc, oshape):
        return pl.pallas_call(
            _make_apply_kernel(S, True, float(cfg.eps), reg),
            grid=(n_blocks,),
            in_specs=[x_spec, x_spec, y_spec, racc_spec, scale_spec],
            out_specs=[y_spec, y_spec],
            out_shape=[oshape, oshape],
            compiler_params=params,
            interpret=interpret,
        )(xre_p, xim_p, mags_p, racc, inv_ma)

    def apply_y(yre, yim, racc, oshape):
        return pl.pallas_call(
            _make_apply_kernel(S, False, float(cfg.eps), reg),
            grid=(n_blocks,),
            in_specs=[x_spec, x_spec, y_spec, y_spec, racc_spec, scale_spec],
            out_specs=[y_spec, y_spec],
            out_shape=[oshape, oshape],
            compiler_params=params,
            interpret=interpret,
        )(xre_p, xim_p, yre, yim, racc, inv_ma)

    racc = reduce_mags(xre_p, xim_p, mags_p)
    last = cfg.iterations == 1
    yre, yim = apply_mags(racc, y_shape_out if last else y_shape)
    for it in range(cfg.iterations - 1):
        # later iterations read the previous y; rescale to the working
        # (divided-by-max_abs) frame first — apply emits y * max_abs
        yre_s = yre * inv_ma[0, 0]
        yim_s = yim * inv_ma[0, 0]
        racc = reduce_y(yre_s, yim_s)
        last = it == cfg.iterations - 2
        yre, yim = apply_y(yre_s, yim_s, racc, y_shape_out if last else y_shape)

    return yre[:, :, :T], yim[:, :, :T]


@functools.partial(
    jax.jit,
    static_argnames=("n_bins", "cfg", "time_block", "interpret", "out_dtype"),
)
def wiener_planes_from_masks(
    xre: Array,
    xim: Array,
    masks: Array,
    n_bins: int,
    cfg: WienerConfig,
    time_block: int = 8,
    interpret: bool = False,
    out_dtype=jnp.float32,
) -> tuple[Array, Array]:
    """EM-refined estimates straight from the NETWORK-LAYOUT masks.

    xre/xim: (2, T, F) mix planes; masks: (S, T, 2*n_bins) stacked-stereo
    masks exactly as the mask network emits them.  Returns (yre, yim)
    each (S, 2, T, F).

    This is the hot path inside the segment program: the initial Wiener
    estimate is y = mag*unit(x) = (mask*|x|)*x/|x| = mask * x, so the
    kernels read the masks directly — no (S,2,T,F) transpose, no
    magnitude product, no phasors.

    Two hard-won in-context rules (scripts/profile-wiener*.py drills,
    perfetto traces):

    * the frequency axis is NOT padded — Pallas accepts blocks equal to
      the full array dimension, so F=2049 rides as-is and the kernel
      inputs are pure reshapes of their producers;
    * the blocks are deliberately SMALL (default time_block=8, ~2 MB
      in-flight) with a tight vmem_limit: a Pallas call whose scoped
      VMEM footprint is large (e.g. 136-row blocks ≈ 100 MB) makes
      XLA's allocator evict the surrounding LSTM scans' VMEM-resident
      weights — measured +16 ms on the three scans (8.7 vs 5.6 µs/step)
      with ZERO time attributable to the kernels themselves.
    """
    S, T, two_bins = masks.shape
    assert two_bins == 2 * n_bins
    F = xre.shape[-1]
    assert F == n_bins

    max_abs = jnp.maximum(1.0, jnp.max(jnp.sqrt(xre * xre + xim * xim)) / cfg.scale_factor)
    inv_ma = (1.0 / max_abs).reshape(1, 1).astype(jnp.float32)

    xre_p = _pad_to(xre.astype(jnp.float32), -2, time_block)
    xim_p = _pad_to(xim.astype(jnp.float32), -2, time_block)
    # masks keep their storage dtype (bf16 under EngineConfig.mask_dtype
    # halves both kernels' mask read traffic) and are split per channel —
    # leading-dim-only kernel indexing keeps zero-offset Mosaic layouts
    # (replaces the old (S, T, 2, F) minor-split reshape; same relayout
    # class, half the bytes under bf16)
    m0s = _pad_to(masks[..., :F], -2, time_block)
    m1s = _pad_to(masks[..., F:], -2, time_block)
    Tp = xre_p.shape[-2]
    K = min(time_block, Tp)
    n_blocks = Tp // K
    reg = float(cfg.eps) ** 0.5

    x_spec = pl.BlockSpec((2, K, F), lambda b: (0, b, 0), memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec((S, K, F), lambda b: (0, b, 0), memory_space=pltpu.VMEM)
    y_spec = pl.BlockSpec((S, 2, K, F), lambda b: (0, 0, b, 0), memory_space=pltpu.VMEM)
    racc_spec = pl.BlockSpec((4 * S, F), lambda b: (0, 0), memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM)
    params = pltpu.CompilerParams(
        vmem_limit_bytes=_vmem_limit(
            K, F, S, jnp.dtype(masks.dtype).itemsize, jnp.dtype(out_dtype).itemsize
        )
    )
    y_shape = jax.ShapeDtypeStruct((S, 2, Tp, F), jnp.float32)
    y_shape_out = jax.ShapeDtypeStruct((S, 2, Tp, F), out_dtype)

    racc = pl.pallas_call(
        _make_reduce_kernel_masks(S),
        grid=(n_blocks,),
        in_specs=[x_spec, x_spec, m_spec, m_spec, scale_spec],
        out_specs=racc_spec,
        out_shape=jax.ShapeDtypeStruct((4 * S, F), jnp.float32),
        compiler_params=params,
        interpret=interpret,
    )(xre_p, xim_p, m0s, m1s, inv_ma)
    last = cfg.iterations == 1
    yre, yim = pl.pallas_call(
        _make_apply_kernel_masks(S, float(cfg.eps), reg),
        grid=(n_blocks,),
        in_specs=[x_spec, x_spec, m_spec, m_spec, racc_spec, scale_spec],
        out_specs=[y_spec, y_spec],
        out_shape=[y_shape_out if last else y_shape] * 2,
        compiler_params=params,
        interpret=interpret,
    )(xre_p, xim_p, m0s, m1s, racc, inv_ma)

    for it in range(cfg.iterations - 1):
        # further EM iterations use the generic y-based kernels
        # (intermediate y always float32; only the final apply emits
        # out_dtype)
        yre_s = yre * inv_ma[0, 0]
        yim_s = yim * inv_ma[0, 0]
        racc = pl.pallas_call(
            _make_reduce_kernel(S, from_mags=False),
            grid=(n_blocks,),
            in_specs=[y_spec, y_spec],
            out_specs=racc_spec,
            out_shape=jax.ShapeDtypeStruct((4 * S, F), jnp.float32),
            compiler_params=params,
            interpret=interpret,
        )(yre_s, yim_s)
        last = it == cfg.iterations - 2
        yre, yim = pl.pallas_call(
            _make_apply_kernel(S, False, float(cfg.eps), reg),
            grid=(n_blocks,),
            in_specs=[x_spec, x_spec, y_spec, y_spec, racc_spec, scale_spec],
            out_specs=[y_spec, y_spec],
            out_shape=[y_shape_out if last else y_shape] * 2,
            compiler_params=params,
            interpret=interpret,
        )(xre_p, xim_p, yre_s, yim_s, racc, inv_ma)

    return yre[:, :, :T], yim[:, :, :T]
