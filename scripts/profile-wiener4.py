#!/usr/bin/env python
"""Fourth wiener drill, single-copy in-context (R=1, the real program):

  base        upstream only (stft+mag+net)
  w_full      + wiener_planes_from_masks            (current hot path)
  w_nomax     + same but inv_ma = const 1.0         (costs the scalar max chain)
  w_reduce    + reduce kernel only
  w_apply     + apply kernel only (racc = const)
  w_barrier   + full, inputs behind optimization_barrier
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
    FP = 2176

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
        masks, _ = umx_forward(p, x, st, mcfg, cfg.compute_dtype)
        return re, im, masks

    def prep(p, a, st, const_scale):
        re, im, masks = upstream(p, a, st)
        T = re.shape[-2]
        if const_scale:
            inv_ma = jnp.ones((1, 1), jnp.float32)
        else:
            ma = jnp.maximum(1.0, jnp.max(jnp.sqrt(re * re + im * im)) / wcfg.scale_factor)
            inv_ma = (1.0 / ma).reshape(1, 1)
        xre_p = wp._pad_to(wp._pad_to(re, -1, 128), -2, TB)
        xim_p = wp._pad_to(wp._pad_to(im, -1, 128), -2, TB)
        masks_p = wp._pad_to(
            masks.reshape(S, T, 2, 2049), -1, 128
        ).reshape(S, T, 2 * FP)
        masks_p = wp._pad_to(masks_p, -2, TB)
        return xre_p, xim_p, masks_p, inv_ma

    params_c = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    def specs(Tp):
        x_spec = pl.BlockSpec((2, TB, FP), lambda b: (0, b, 0), memory_space=pltpu.VMEM)
        m_spec = pl.BlockSpec((S, TB, 2 * FP), lambda b: (0, b, 0), memory_space=pltpu.VMEM)
        y_spec = pl.BlockSpec((S, 2, TB, FP), lambda b: (0, 0, b, 0), memory_space=pltpu.VMEM)
        racc_spec = pl.BlockSpec((4 * S, FP), lambda b: (0, 0), memory_space=pltpu.VMEM)
        scale_spec = pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM)
        return x_spec, m_spec, y_spec, racc_spec, scale_spec

    def reduce_call(xre_p, xim_p, masks_p, inv_ma):
        Tp = xre_p.shape[-2]
        x_spec, m_spec, y_spec, racc_spec, scale_spec = specs(Tp)
        return pl.pallas_call(
            wp._make_reduce_kernel_masks(S, FP),
            grid=(Tp // TB,),
            in_specs=[x_spec, x_spec, m_spec, scale_spec],
            out_specs=racc_spec,
            out_shape=jax.ShapeDtypeStruct((4 * S, FP), jnp.float32),
            compiler_params=params_c,
        )(xre_p, xim_p, masks_p, inv_ma)

    def apply_call(xre_p, xim_p, masks_p, racc, inv_ma):
        Tp = xre_p.shape[-2]
        x_spec, m_spec, y_spec, racc_spec, scale_spec = specs(Tp)
        return pl.pallas_call(
            wp._make_apply_kernel_masks(S, FP, float(wcfg.eps), float(wcfg.eps) ** 0.5),
            grid=(Tp // TB,),
            in_specs=[x_spec, x_spec, m_spec, racc_spec, scale_spec],
            out_specs=[y_spec, y_spec],
            out_shape=[
                jax.ShapeDtypeStruct((S, 2, Tp, FP), jnp.float32),
                jax.ShapeDtypeStruct((S, 2, Tp, FP), jnp.float32),
            ],
            compiler_params=params_c,
        )(xre_p, xim_p, masks_p, racc, inv_ma)

    def base(p, a, st):
        re, im, masks = upstream(p, a, st)
        return re, masks

    def w_full(p, a, st):
        ins = prep(p, a, st, const_scale=False)
        racc = reduce_call(*ins)
        return apply_call(ins[0], ins[1], ins[2], racc, ins[3])

    def w_nomax(p, a, st):
        ins = prep(p, a, st, const_scale=True)
        racc = reduce_call(*ins)
        return apply_call(ins[0], ins[1], ins[2], racc, ins[3])

    def w_reduce(p, a, st):
        ins = prep(p, a, st, const_scale=False)
        return reduce_call(*ins)

    def w_apply(p, a, st):
        ins = prep(p, a, st, const_scale=False)
        racc = jnp.ones((4 * S, FP), jnp.float32)
        return apply_call(ins[0], ins[1], ins[2], racc, ins[3])

    def w_barrier(p, a, st):
        ins = prep(p, a, st, const_scale=False)
        ins = jax.lax.optimization_barrier(ins)
        racc = reduce_call(*ins)
        return apply_call(ins[0], ins[1], ins[2], racc, ins[3])

    prev = None
    for name, fn in (("base", base), ("w_full", w_full), ("w_nomax", w_nomax),
                     ("w_reduce", w_reduce), ("w_apply", w_apply),
                     ("w_barrier", w_barrier)):
        ms = timeit(fn) * 1000
        extra = "" if prev is None else f"   (+{ms - prev:6.2f} vs base)"
        if name == "base":
            prev = ms
        print(f"{name:>10}: {ms:8.2f} ms{extra}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
