#!/usr/bin/env python
"""Recurrence-floor microbenchmark: can the 8 weight-distinct
(target, direction) LSTM chains go faster as block-diagonal matmuls?
(VERDICT r1 #7 / ROADMAP idea.)

Each variant runs a length-T dependent fori_loop INSIDE one jitted
program (no dispatch overhead) where every step computes the hh-gemm(s)
+ LSTM gate math for all 8 chains, carrying h/c:

  separate8   — 8 × (1,512)@(512,2048) dot_generals (current scan shape)
  batched8    — one batched dot_general, batch dim 8 (XLA batch instances)
  blockdiag2  — 2 × (1,2048)@(2048,8192) block-diagonal merges (4 chains
                each; 4x the FLOPs, VMEM-resident at bf16)
  blockdiag1  — 1 × (1,4096)@(4096,16384) full merge (8x FLOPs, 134 MB
                bf16 — exceeds VMEM, streams from HBM)
  rows8       — control: 8 chains as 8 ROWS through ONE shared weight
                (what the floor theory says is free)
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

G = 512
T = 512  # steps per measurement (marginal cost is linear in T)


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
        # rec: (R, 4G) pre-activation recurrence term
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
            s = float(jnp.sum(jax.tree.leaves(out)[0]))
            del s
            walls.append((time.perf_counter() - t0) / reps)
        return sorted(walls)[1]

    h0 = jnp.asarray(rng.standard_normal((8, G)).astype(np.float32))
    c0 = jnp.asarray(rng.standard_normal((8, G)).astype(np.float32))
    w8 = jnp.asarray(rng.standard_normal((8, G, 4 * G)).astype(np.float32) * 0.05)
    w8_bf = w8.astype(jnp.bfloat16)

    results = {}

    # --- separate8: unrolled per-chain dots ---------------------------------
    def step_sep(h, c, w):
        rec = jnp.concatenate(
            [
                jax.lax.dot_general(
                    h[r : r + 1].astype(w.dtype),
                    w[r],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for r in range(8)
            ],
            axis=0,
        )
        return gates_step(h, c, rec)

    results["separate8"] = timeit(partial(run_loop, step_sep), h0, c0, w8_bf)

    # --- batched8: one batched dot_general ----------------------------------
    def step_bat(h, c, w):
        rec = jax.lax.dot_general(
            h[:, None, :].astype(w.dtype),
            w,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )[:, 0, :]
        return gates_step(h, c, rec)

    results["batched8"] = timeit(partial(run_loop, step_bat), h0, c0, w8_bf)

    # --- blockdiag2: two 4-chain merges -------------------------------------
    def make_blockdiag(wsub):  # (k, G, 4G) -> (k*G, k*4G)
        k = wsub.shape[0]
        big = np.zeros((k * G, k * 4 * G), np.float32)
        for r in range(k):
            big[r * G : (r + 1) * G, r * 4 * G : (r + 1) * 4 * G] = np.asarray(wsub[r])
        return big

    bd2 = [
        jnp.asarray(make_blockdiag(w8[:4])).astype(jnp.bfloat16),
        jnp.asarray(make_blockdiag(w8[4:])).astype(jnp.bfloat16),
    ]

    def step_bd2(h, c, wa, wb):
        ha = h[:4].reshape(1, 4 * G)
        hb = h[4:].reshape(1, 4 * G)
        ra = jax.lax.dot_general(
            ha.astype(wa.dtype), wa,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(4, 4 * G)
        rb = jax.lax.dot_general(
            hb.astype(wb.dtype), wb,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(4, 4 * G)
        return gates_step(h, c, jnp.concatenate([ra, rb], axis=0))

    results["blockdiag2"] = timeit(partial(run_loop, step_bd2), h0, c0, *bd2)

    # --- blockdiag1: one full merge (exceeds VMEM) ---------------------------
    bd1 = jnp.asarray(make_blockdiag(w8)).astype(jnp.bfloat16)

    def step_bd1(h, c, w):
        r = jax.lax.dot_general(
            h.reshape(1, 8 * G).astype(w.dtype), w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(8, 4 * G)
        return gates_step(h, c, r)

    results["blockdiag1"] = timeit(partial(run_loop, step_bd1), h0, c0, bd1)

    # --- rows8 control: shared weight, 8 rows -------------------------------
    w1 = w8_bf[0]

    def step_rows(h, c, w):
        rec = jax.lax.dot_general(
            h.astype(w.dtype), w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return gates_step(h, c, rec)

    results["rows8"] = timeit(partial(run_loop, step_rows), h0, c0, w1)

    print(f"# device: {jax.devices()[0]}, T={T} dependent steps")
    for k, v in results.items():
        print(f"{k:>12}: {v / T * 1e6:7.2f} us/step")
    return 0


if __name__ == "__main__":
    sys.exit(main())
