#!/usr/bin/env python
"""Third wiener drill: isolate WHY the reduce kernel runs at ~20 GB/s.

Variants (all timed as R dependent-chained copies inside one program —
copy i+1's input is perturbed by copy i's output, so nothing overlaps,
reproducing the in-context serialization without the network):

  reduce_now      current kernel (revisited accumulator output)
  reduce_partial  per-block partial outputs (no output revisit), summed outside
  reduce_scratch  VMEM scratch accumulator, output written once at the end
  reduce_fromy    from_mags=False (y planes precomputed; no unit phasors)
  dma_only        control: same input blocks, output = first rows (pure DMA)
  apply_now       current apply kernel (for reference)
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

    from umx_tpu.ops import wiener_pallas as wp

    S, T, F = 4, 2584, 2176
    TB = 136
    n_blocks = T // TB
    rng = np.random.default_rng(0)
    xre = jnp.asarray(rng.standard_normal((2, T, F)).astype(np.float32))
    xim = jnp.asarray(rng.standard_normal((2, T, F)).astype(np.float32))
    mags = jnp.asarray(rng.uniform(0, 1, (S, 2, T, F)).astype(np.float32))
    inv_ma = jnp.ones((1, 1), jnp.float32)

    x_spec = pl.BlockSpec((2, TB, F), lambda b: (0, b, 0), memory_space=pltpu.VMEM)
    y_spec = pl.BlockSpec((S, 2, TB, F), lambda b: (0, 0, b, 0), memory_space=pltpu.VMEM)
    racc_spec = pl.BlockSpec((4 * S, F), lambda b: (0, 0), memory_space=pltpu.VMEM)
    part_spec = pl.BlockSpec((1, 4 * S, F), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    scale_spec = pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    def partial_rows(xre_ref, xim_ref, mag_ref, scale_ref):
        inv = scale_ref[0, 0]
        u0re, u0im = wp._unit_phasors(xre_ref[0], xim_ref[0])
        u1re, u1im = wp._unit_phasors(xre_ref[1], xim_ref[1])
        rows = []
        for s in range(S):
            m0 = mag_ref[s, 0] * inv
            m1 = mag_ref[s, 1] * inv
            y0r, y0i = m0 * u0re, m0 * u0im
            y1r, y1i = m1 * u1re, m1 * u1im
            rows.append(jnp.sum(y0r * y0r + y0i * y0i, axis=0, keepdims=True))
            rows.append(jnp.sum(y1r * y1r + y1i * y1i, axis=0, keepdims=True))
            rows.append(jnp.sum(y0r * y1r + y0i * y1i, axis=0, keepdims=True))
            rows.append(jnp.sum(y0i * y1r - y0r * y1i, axis=0, keepdims=True))
        return jnp.concatenate(rows, axis=0)

    # -- variants ------------------------------------------------------------
    def reduce_now(xre, xim, mags):
        return pl.pallas_call(
            wp._make_reduce_kernel(S, from_mags=True),
            grid=(n_blocks,),
            in_specs=[x_spec, x_spec, y_spec, scale_spec],
            out_specs=racc_spec,
            out_shape=jax.ShapeDtypeStruct((4 * S, F), jnp.float32),
            compiler_params=params,
        )(xre, xim, mags, inv_ma)

    def _partial_kernel(xre_ref, xim_ref, mag_ref, scale_ref, out_ref):
        out_ref[0] = partial_rows(xre_ref, xim_ref, mag_ref, scale_ref)

    def reduce_partial(xre, xim, mags):
        parts = pl.pallas_call(
            _partial_kernel,
            grid=(n_blocks,),
            in_specs=[x_spec, x_spec, y_spec, scale_spec],
            out_specs=part_spec,
            out_shape=jax.ShapeDtypeStruct((n_blocks, 4 * S, F), jnp.float32),
            compiler_params=params,
        )(xre, xim, mags, inv_ma)
        return jnp.sum(parts, axis=0)

    def _scratch_kernel(xre_ref, xim_ref, mag_ref, scale_ref, out_ref, acc):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        acc[:] += partial_rows(xre_ref, xim_ref, mag_ref, scale_ref)

        @pl.when(b == pl.num_programs(0) - 1)
        def _():
            out_ref[:] = acc[:]

    def reduce_scratch(xre, xim, mags):
        return pl.pallas_call(
            _scratch_kernel,
            grid=(n_blocks,),
            in_specs=[x_spec, x_spec, y_spec, scale_spec],
            out_specs=racc_spec,
            out_shape=jax.ShapeDtypeStruct((4 * S, F), jnp.float32),
            scratch_shapes=[pltpu.VMEM((4 * S, F), jnp.float32)],
            compiler_params=params,
        )(xre, xim, mags, inv_ma)

    def reduce_fromy(xre, xim, mags):
        # reuse mags as fake y planes (same shapes/traffic)
        return pl.pallas_call(
            wp._make_reduce_kernel(S, from_mags=False),
            grid=(n_blocks,),
            in_specs=[y_spec, y_spec],
            out_specs=racc_spec,
            out_shape=jax.ShapeDtypeStruct((4 * S, F), jnp.float32),
            compiler_params=params,
        )(mags, mags)

    def _dma_kernel(xre_ref, xim_ref, mag_ref, scale_ref, out_ref):
        out_ref[0] = (
            mag_ref[0, 0, : 4 * S] + xre_ref[0, : 4 * S] + xim_ref[1, : 4 * S]
        ) * scale_ref[0, 0]

    def dma_only(xre, xim, mags):
        parts = pl.pallas_call(
            _dma_kernel,
            grid=(n_blocks,),
            in_specs=[x_spec, x_spec, y_spec, scale_spec],
            out_specs=part_spec,
            out_shape=jax.ShapeDtypeStruct((n_blocks, 4 * S, F), jnp.float32),
            compiler_params=params,
        )(xre, xim, mags, inv_ma)
        return jnp.sum(parts, axis=0)

    def apply_now(xre, xim, mags):
        racc = jnp.ones((4 * S, F), jnp.float32)
        yre, yim = pl.pallas_call(
            wp._make_apply_kernel(S, True, 1e-10, 1e-5),
            grid=(n_blocks,),
            in_specs=[x_spec, x_spec, y_spec, racc_spec, scale_spec],
            out_specs=[y_spec, y_spec],
            out_shape=[
                jax.ShapeDtypeStruct((S, 2, T, F), jnp.float32),
                jax.ShapeDtypeStruct((S, 2, T, F), jnp.float32),
            ],
            compiler_params=params,
        )(xre, xim, mags, racc, inv_ma)
        return yre[:, :, :1, :] + yim[:, :, :1, :]  # small dependent slice

    R = 5

    def timeit(variant):
        def chained(xre, xim, mags):
            out = None
            a, b, m = xre, xim, mags
            for _ in range(R):
                out = variant(a, b, m)
                eps = 1e-12 * jnp.sum(out[..., :1])
                m = m * (1.0 + eps)  # dependency: forbids overlap
            return jnp.sum(out)

        fn = jax.jit(chained)
        float(fn(xre, xim, mags))
        float(fn(xre, xim, mags))
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            s = None
            for _ in range(6):
                s = fn(xre, xim, mags)
            float(s)
            walls.append((time.perf_counter() - t0) / 6)
        return sorted(walls)[1] / R

    gb = (2 * 2 + S * 2) * T * F * 4 / 1e9
    for name, v in (
        ("dma_only", dma_only),
        ("reduce_now", reduce_now),
        ("reduce_partial", reduce_partial),
        ("reduce_scratch", reduce_scratch),
        ("reduce_fromy", reduce_fromy),
        ("apply_now", apply_now),
    ):
        dt = timeit(v)
        print(f"{name:>15}: {dt * 1000:7.2f} ms  ({gb / dt:.0f} GB/s input-side)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
