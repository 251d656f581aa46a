#!/usr/bin/env python
"""Cross-chunk LAYER-PIPELINE feasibility probe for the streaming
recurrence (round 3).

PERF.md's exhaustion argument killed layer pipelining WITHIN one
segment (a bidirectional layer needs the full previous-layer sequence).
It did NOT consider pipelining ACROSS the fused track's chunk sequence:
layer l of chunk k only needs (a) layer l-1 of chunk k — finished one
pipeline stage earlier — and (b) its own layer-l state from chunk k-1.
So a 3-stage schedule where scan iteration k computes

    L1(chunk k) | L2(chunk k-1) | L3(chunk k-2)

is mathematically identical to the serial streaming program while
tripling the independent weight-distinct chains per recurrence step
(8 target x direction chains -> 24).

Whether that buys wall-time on a single serially-executing core is an
empirical latency-hiding question.  Per dependent step this probe
measures the 8/16/24/32-chain weight-distinct shapes:

    pipeline win per chunk = C8 / (C24 / 3)

C24 == C8   -> full latency hiding, ~3x on the recurrence dots.
C24 == 3*C8 -> issue-bound saturation, the idea is dead; record the
               number as the closing clause of the exhaustion argument.

(The B=16 segment-batch fold saturating at 2.3x suggests partial hiding
at best; chains here are WEIGHT-DISTINCT, the expensive kind — see the
block-diag table's 37.3 vs 16.8 us/step control split.)

Methodology per the repo rules: dependent fori_loop inside one jitted
program, N pipelined dispatches per window, one scalar drain.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

G = 512
T = 512  # dependent steps per program; marginal cost linear in T


def main() -> int:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/umx_tpu_xla_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)

    def gates_step(h, c, rec):
        i = jax.nn.sigmoid(rec[:, :G])
        f = jax.nn.sigmoid(rec[:, G : 2 * G])
        g = jnp.tanh(rec[:, 2 * G : 3 * G])
        o = jax.nn.sigmoid(rec[:, 3 * G :])
        c = f * c + i * g
        return o * jnp.tanh(c), c

    def run_loop(step_fn, h0, c0, *weights):
        def body(_, hc):
            h, c = hc
            return step_fn(h, c, *weights)

        return jax.lax.fori_loop(0, T, body, (h0, c0))

    def timeit(fn, *args, reps=5):
        out = jax.jit(fn)(*args)
        jax.tree.leaves(out)[0].block_until_ready()
        float(jnp.sum(jax.tree.leaves(out)[0]))
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                out = jax.jit(fn)(*args)
            float(jnp.sum(jax.tree.leaves(out)[0]))
            walls.append((time.perf_counter() - t0) / reps)
        return sorted(walls)[1]

    def step_sep(n, h, c, w):
        # n weight-distinct chains, one (1,G)@(G,4G) dot each — the
        # current merged-kernel body shape, scaled in chain count
        rec = jnp.concatenate(
            [
                jax.lax.dot_general(
                    h[r : r + 1].astype(w.dtype),
                    w[r],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for r in range(n)
            ],
            axis=0,
        )
        return gates_step(h, c, rec)

    def step_batched(h, c, w):
        rec = jax.lax.dot_general(
            h[:, None, :].astype(w.dtype),
            w,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[:, 0, :]
        return gates_step(h, c, rec)

    results = {}
    for n in (8, 16, 24, 32):
        h0 = jnp.asarray(rng.standard_normal((n, G)).astype(np.float32))
        c0 = jnp.asarray(rng.standard_normal((n, G)).astype(np.float32))
        w = jnp.asarray(
            rng.standard_normal((n, G, 4 * G)).astype(np.float32) * 0.05
        ).astype(jnp.bfloat16)
        s = timeit(partial(run_loop, partial(step_sep, n)), h0, c0, w) / T * 1e6
        b = timeit(partial(run_loop, step_batched), h0, c0, w) / T * 1e6
        results[f"sep{n}"] = s
        results[f"bat{n}"] = b
        print(f"n={n:2d}: separate {s:7.2f} us/step   batched {b:7.2f} us/step",
              flush=True)

    c8, c24 = results["sep8"], results["sep24"]
    win = c8 / (c24 / 3.0)
    print(f"# pipeline win per chunk (sep): {win:.2f}x "
          f"(C24/C8 = {c24 / c8:.2f}; 1.0 = full hiding, 3.0 = dead)")
    b8, b24 = results["bat8"], results["bat24"]
    print(f"# pipeline win per chunk (bat): {b8 / (b24 / 3.0):.2f}x "
          f"(C24/C8 = {b24 / b8:.2f})")

    # ---- the REAL kernel: _merged_rows at R=8 vs R=24 chains -----------
    # This is exactly the invocation a pipelined track program would
    # make (3 layers' weight sets stacked into R=24, B=1) — no kernel
    # rewrite involved, _merged_rows is general over R.
    from umx_tpu.ops.lstm_pallas import _merged_rows

    interpret = jax.devices()[0].platform not in ("tpu", "axon")
    Tk = 8 if interpret else 512  # interpret mode is ~1000x slower
    for R in (8, 16, 24):
        xp = jnp.asarray(
            rng.standard_normal((Tk, R, 4 * G)).astype(np.float32) * 0.05
        )
        # bf16 hh, exactly as the production callers feed _merged_rows
        # (_merged_batched_impl casts before the call); f32 at R=24 is
        # 100.7 MB of weights alone and trips Mosaic's scoped-VMEM check
        hh = jnp.asarray(
            rng.standard_normal((R, G, 4 * G)).astype(np.float32) * 0.05
        ).astype(jnp.bfloat16)
        h0 = jnp.zeros((R, G), jnp.float32)
        c0 = jnp.zeros((R, G), jnp.float32)

        def run(xp, hh, h0, c0, R=R):
            return _merged_rows(xp, hh, h0, c0, 1, 16, interpret)[0]

        us = timeit(run, xp, hh, h0, c0) / Tk * 1e6
        results[f"kernel_R{R}"] = us
        print(f"kernel R={R:2d}: {us:7.2f} us/step", flush=True)
    k8, k24 = results["kernel_R8"], results["kernel_R24"]
    print(f"# KERNEL pipeline win per chunk: {k8 / (k24 / 3.0):.2f}x "
          f"(C24/C8 = {k24 / k8:.2f}; 1.0 = full hiding, 3.0 = dead)")
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
