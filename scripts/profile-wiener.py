#!/usr/bin/env python
"""In-context Wiener drill (the survivor of the round-2 drill series;
the full investigation and its conclusions — Pallas scoped-VMEM
eviction, the XLA strided-add->convolution rewrite — are documented in
PERF.md "The in-context composition saga"):

  base        upstream (stft+mag+net)
  prep_out    upstream + padded tensors AS PROGRAM OUTPUTS (prep cost)
  w_nopad     upstream + kernels on UNPADDED arrays (full-dim F blocks)
  w_current   upstream + the shipping from-masks path (reference point)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/umx_tpu_xla_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from umx_tpu.config import EngineConfig, SegmentConfig
    from umx_tpu.engine.separator import crop_stack
    from umx_tpu.models.umx import init_lstm_state, synthetic_params, umx_forward
    from umx_tpu.ops import stft as stft_ops
    from umx_tpu.ops import wiener_pallas as wp
    from umx_tpu.ops.wiener import wiener_filter_masks

    cfg = EngineConfig(segment=SegmentConfig(segment_secs=60.0))
    mcfg, dcfg = cfg.model, cfg.dsp
    wcfg = cfg.wiener
    n = cfg.segment.segment_samples(dcfg.sample_rate)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.uniform(-0.5, 0.5, (2, n)).astype(np.float32))
    params = synthetic_params(mcfg, seed=0)
    state = init_lstm_state(mcfg)
    S = mcfg.n_targets
    TB = 136
    F = 2049

    def drain(x):
        return float(jnp.sum(jax.tree.leaves(x)[0]))

    def timeit(stage, reps=20):
        fn = jax.jit(stage)
        drain(fn(params, audio, state))
        drain(fn(params, audio, state))
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(reps):
                out = fn(params, audio, state)
            drain(out)
            walls.append((time.perf_counter() - t0) / reps)
        return sorted(walls)[1]

    def upstream(p, a, st):
        re, im = stft_ops.stft_planes(a, dcfg)
        mag = jnp.sqrt(re * re + im * im)
        x = crop_stack(mag, mcfg.nb_bins_cropped)
        masks, _ = umx_forward(p, x, st, mcfg, cfg.matmul_precision)
        return re, im, masks

    def base(p, a, st):
        return upstream(p, a, st)

    def prep_out(p, a, st):
        re, im, masks = upstream(p, a, st)
        T = re.shape[-2]
        xre_p = wp._pad_to(wp._pad_to(re, -1, 128), -2, TB)
        xim_p = wp._pad_to(wp._pad_to(im, -1, 128), -2, TB)
        masks_p = wp._pad_to(masks.reshape(S, T, 2, F), -1, 128).reshape(S, T, 2 * 2176)
        return xre_p, xim_p, masks_p  # program outputs: forced materialization

    # ---- no-pad kernels ------------------------------------------------------
    def reduce_kernel(xre_ref, xim_ref, mask_ref, scale_ref, racc_ref):
        inv = scale_ref[0, 0]
        sq = inv * inv
        ax0 = xre_ref[0] * xre_ref[0] + xim_ref[0] * xim_ref[0]
        ax1 = xre_ref[1] * xre_ref[1] + xim_ref[1] * xim_ref[1]
        cr = xre_ref[0] * xre_ref[1] + xim_ref[0] * xim_ref[1]
        ci = xim_ref[0] * xre_ref[1] - xre_ref[0] * xim_ref[1]
        rows = []
        for s in range(S):
            m0 = mask_ref[s, :, 0]
            m1 = mask_ref[s, :, 1]
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

    def apply_kernel(xre_ref, xim_ref, mask_ref, racc_ref, scale_ref, yre_ref, yim_ref):
        inv_ma = scale_ref[0, 0]
        sq = inv_ma * inv_ma
        ax0 = xre_ref[0] * xre_ref[0] + xim_ref[0] * xim_ref[0]
        ax1 = xre_ref[1] * xre_ref[1] + xim_ref[1] * xim_ref[1]

        def v_of(s):
            m0 = mask_ref[s, :, 0]
            m1 = mask_ref[s, :, 1]
            return 0.5 * sq * (m0 * m0 * ax0 + m1 * m1 * ax1)

        wp._apply_common(xre_ref, xim_ref, v_of, racc_ref, inv_ma, yre_ref, yim_ref,
                         S, float(wcfg.eps), float(wcfg.eps) ** 0.5)

    params_c = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    def w_nopad(p, a, st):
        re, im, masks = upstream(p, a, st)
        T = re.shape[-2]
        masks4 = masks.reshape(S, T, 2, F)
        ma = jnp.maximum(1.0, jnp.max(jnp.sqrt(re * re + im * im)) / wcfg.scale_factor)
        inv_ma = (1.0 / ma).reshape(1, 1)
        x_spec = pl.BlockSpec((2, TB, F), lambda b: (0, b, 0), memory_space=pltpu.VMEM)
        m_spec = pl.BlockSpec((S, TB, 2, F), lambda b: (0, b, 0, 0), memory_space=pltpu.VMEM)
        y_spec = pl.BlockSpec((S, 2, TB, F), lambda b: (0, 0, b, 0), memory_space=pltpu.VMEM)
        racc_spec = pl.BlockSpec((4 * S, F), lambda b: (0, 0), memory_space=pltpu.VMEM)
        scale_spec = pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM)
        racc = pl.pallas_call(
            reduce_kernel,
            grid=(T // TB,),
            in_specs=[x_spec, x_spec, m_spec, scale_spec],
            out_specs=racc_spec,
            out_shape=jax.ShapeDtypeStruct((4 * S, F), jnp.float32),
            compiler_params=params_c,
        )(re, im, masks4, inv_ma)
        return pl.pallas_call(
            apply_kernel,
            grid=(T // TB,),
            in_specs=[x_spec, x_spec, m_spec, racc_spec, scale_spec],
            out_specs=[y_spec, y_spec],
            out_shape=[
                jax.ShapeDtypeStruct((S, 2, T, F), jnp.float32),
                jax.ShapeDtypeStruct((S, 2, T, F), jnp.float32),
            ],
            compiler_params=params_c,
        )(re, im, masks4, racc, inv_ma)

    def w_current(p, a, st):
        re, im, masks = upstream(p, a, st)
        return wiener_filter_masks(re, im, masks, F, wcfg)

    prev = None
    for name, fn in (("base", base), ("prep_out", prep_out),
                     ("w_nopad", w_nopad), ("w_current", w_current)):
        ms = timeit(fn) * 1000
        extra = "" if prev is None else f"   (+{ms - prev:6.2f} vs base)"
        if name == "base":
            prev = ms
        print(f"{name:>10}: {ms:8.2f} ms{extra}")

    # correctness of the no-pad variant vs the current path
    a, b = jax.jit(w_nopad)(params, audio, state)
    c, d = jax.jit(w_current)(params, audio, state)
    err = max(float(jnp.max(jnp.abs(a - c))), float(jnp.max(jnp.abs(b - d))))
    print(f"nopad-vs-current max abs err: {err:.3e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
