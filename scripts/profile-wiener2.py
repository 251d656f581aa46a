#!/usr/bin/env python
"""Second wiener drill: explicit in-context stages with NO dead code
(all leaves summed):

  A  upstream (stft+mag+net+apply_masks)
  B  A + pad/transpose materialization of the kernel inputs
  C  B + reduce kernel
  D  B + reduce + apply kernels (= full wiener)

Marginals give the true in-context cost of (pad), (reduce), (apply).
time_block=136 divides T=2584 (no time padding).
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
    import dataclasses

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from umx_tpu.config import EngineConfig, SegmentConfig
    from umx_tpu.engine.separator import apply_masks, crop_stack
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
    TB = 136  # divides 2584

    R = 6
    reps = 8

    def drain(x):
        return float(jnp.sum(jax.tree.leaves(x)[0]))

    def timeit(stage, *a):
        def many(*a):
            acc = None
            for i in range(R):
                pert = tuple(
                    x * (1.0 + 1e-7 * (i + 1))
                    if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.floating)
                    else x
                    for x in a
                )
                out = stage(*pert)
                s = sum(jnp.sum(leaf) for leaf in jax.tree.leaves(out))
                acc = s if acc is None else acc + s
            return acc

        fn = jax.jit(many)
        drain(fn(*a))
        drain(fn(*a))
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(reps):
                out = fn(*a)
            drain(out)
            walls.append((time.perf_counter() - t0) / reps)
        return sorted(walls)[1] / R

    def upstream(p, a, st):
        re, im = stft_ops.stft_planes(a, dcfg)
        mag = jnp.sqrt(re * re + im * im)
        x = crop_stack(mag, mcfg.nb_bins_cropped)
        masks, _ = umx_forward(p, x, st, mcfg, cfg.compute_dtype)
        tm = apply_masks(masks, mag, mcfg.n_bins)
        return re, im, tm

    def padded(p, a, st):
        re, im, tm = upstream(p, a, st)
        xre_p = wp._pad_to(wp._pad_to(re, -1, 128), -2, TB)
        xim_p = wp._pad_to(wp._pad_to(im, -1, 128), -2, TB)
        mags_p = wp._pad_to(wp._pad_to(tm, -1, 128), -2, TB)
        max_abs = jnp.maximum(1.0, jnp.max(jnp.sqrt(re * re + im * im)) / wcfg.scale_factor)
        return xre_p, xim_p, mags_p, max_abs

    def specs(Tp, Fp, K):
        x_spec = pl.BlockSpec((2, K, Fp), lambda b: (0, b, 0), memory_space=pltpu.VMEM)
        y_spec = pl.BlockSpec((S, 2, K, Fp), lambda b: (0, 0, b, 0), memory_space=pltpu.VMEM)
        racc_spec = pl.BlockSpec((4 * S, Fp), lambda b: (0, 0), memory_space=pltpu.VMEM)
        scale_spec = pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM)
        return x_spec, y_spec, racc_spec, scale_spec

    def with_reduce(p, a, st):
        xre_p, xim_p, mags_p, max_abs = padded(p, a, st)
        inv_ma = (1.0 / max_abs).reshape(1, 1)
        Tp, Fp = xre_p.shape[-2:]
        K = min(TB, Tp)
        x_spec, y_spec, racc_spec, scale_spec = specs(Tp, Fp, K)
        racc = pl.pallas_call(
            wp._make_reduce_kernel(S, from_mags=True),
            grid=(Tp // K,),
            in_specs=[x_spec, x_spec, y_spec, scale_spec],
            out_specs=racc_spec,
            out_shape=jax.ShapeDtypeStruct((4 * S, Fp), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        )(xre_p, xim_p, mags_p, inv_ma)
        return racc

    def full(p, a, st):
        re, im, tm = upstream(p, a, st)
        w2 = dataclasses.replace(wcfg, time_block=TB)
        return wp.wiener_planes_pallas(re, im, tm, w2, time_block=TB)

    for name, fn in (("A upstream", upstream), ("B +pad", padded),
                     ("C +reduce", with_reduce), ("D +full-wiener", full)):
        ms = timeit(fn, params, audio, state) * 1000
        print(f"{name:>15}: {ms:8.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
