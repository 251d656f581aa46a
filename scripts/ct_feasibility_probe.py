#!/usr/bin/env python
"""De-risk probes for the round-3 fused Pallas CT iSTFT (ROADMAP sketch):

  precision — does `precision=HIGHEST/HIGH` inside a Pallas dot give the
              multi-pass f32 accuracy the DFT parity budget needs?
              (compare vs XLA HIGH/HIGHEST and vs float64.)
  transpose — cost of the in-VMEM (n1, n2) minor transpose per frame
              block (the stage-1 -> stage-2 relayout).
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

    rng = np.random.default_rng(0)
    M, K, N = 512, 128, 128
    a = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((K, N)).astype(np.float32))
    ref = np.asarray(a, np.float64) @ np.asarray(b, np.float64)

    def pallas_dot(precision):
        def kernel(a_ref, b_ref, o_ref):
            o_ref[:] = jax.lax.dot_general(
                a_ref[:], b_ref[:],
                dimension_numbers=((((1,), (0,))), ((), ())),
                precision=precision,
                preferred_element_type=jnp.float32,
            )

        return pl.pallas_call(
            kernel,
            in_specs=[
                pl.BlockSpec((M, K), lambda: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, N), lambda: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((M, N), lambda: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        )(a, b)

    for name, prec in [("DEFAULT", jax.lax.Precision.DEFAULT),
                       ("HIGH", jax.lax.Precision.HIGH),
                       ("HIGHEST", jax.lax.Precision.HIGHEST)]:
        try:
            got = np.asarray(jax.jit(lambda: pallas_dot(prec))())
            err = np.abs(got - ref).max() / np.abs(ref).max()
            xla = np.asarray(
                jax.jit(lambda: jax.lax.dot_general(
                    a, b, ((((1,), (0,))), ((), ())), precision=prec
                ))()
            )
            xerr = np.abs(xla - ref).max() / np.abs(ref).max()
            print(f"pallas dot {name:>8}: rel err {err:.2e}   (xla: {xerr:.2e})")
        except Exception as e:  # noqa: BLE001
            print(f"pallas dot {name:>8}: FAILED {type(e).__name__}: {str(e)[:160]}")

    # in-VMEM minor transpose cost: (Kf, 128, 32) -> (Kf, 32, 128) per block
    Kf, n1, n2 = 256, 128, 32
    F = 20672 // Kf * Kf
    x = jnp.asarray(rng.standard_normal((F, n1, n2)).astype(np.float32))

    def tkernel(x_ref, o_ref):
        o_ref[:] = jnp.swapaxes(x_ref[:], -1, -2)

    tcall = pl.pallas_call(
        tkernel,
        grid=(F // Kf,),
        in_specs=[pl.BlockSpec((Kf, n1, n2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((Kf, n2, n1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F, n2, n1), jnp.float32),
    )

    @jax.jit
    def many(x):
        acc = None
        for i in range(4):
            o = tcall(x * (1.0 + 1e-7 * i))
            v = jnp.sum(o)
            acc = v if acc is None else acc + v
        return acc

    try:
        got = np.asarray(jax.jit(tcall)(x))
        assert np.array_equal(got, np.swapaxes(np.asarray(x), -1, -2))
        _ = float(many(x))
        walls = []
        for _w in range(3):
            t0 = time.perf_counter()
            _ = float(many(x))
            walls.append(time.perf_counter() - t0)
        w = sorted(walls)[1] / 4
        gb = 2 * x.size * 4 / 1e9
        print(f"in-VMEM (128,32) transpose over {F} frames: {w * 1e3:.2f} ms  ({gb / w:.0f} GB/s)")
    except Exception as e:  # noqa: BLE001
        print(f"transpose probe: FAILED {type(e).__name__}: {str(e)[:160]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
