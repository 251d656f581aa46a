#!/usr/bin/env python
"""Phase decomposition of the merged BLSTM Pallas kernel's per-step cost.

The merged kernel runs 4.26 µs/step at UMX-L scale; the MXU work is
~0.55 µs and the VPU gate math ~0.3 µs, so most of the step is loop /
layout overhead.  Variants (all length-T dependent chains, one layer,
R=8 chains, G=512, full 60 s T=2584):

  full       — the shipping kernel (matmuls + concat + gate math)
  nogates    — matmuls + concat only; h_s <- tanh(rec slice) keeps the
               dependence
  nomatmul   — gate math only; rec taken from xp (no hh dot)
  perchain   — full math but NO concat: per-chain (1, 4G) ops with
               per-chain scratch rows updated in place
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
    import functools

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, G, T, K = 8, 512, 2584, 8
    G4 = 4 * G
    n_blocks = -(-T // K)
    T_pad = n_blocks * K

    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.standard_normal((T_pad, R, G4)).astype(np.float32) * 0.1)
    hh = jnp.asarray(rng.standard_normal((R, G, G4)).astype(np.float32) * 0.05).astype(
        jnp.bfloat16
    )
    h0 = jnp.zeros((R, G), jnp.float32)
    c0 = jnp.zeros((R, G), jnp.float32)

    def make_kernel(variant: str):
        def kernel(xp_ref, hh_ref, h0_ref, c0_ref, hT_ref, h_s, c_s, rec_s):
            b = pl.program_id(0)

            @pl.when(b == 0)
            def _():
                h_s[:] = h0_ref[:]
                c_s[:] = c0_ref[:]

            def body(k, _):
                h = h_s[:]
                c = c_s[:]
                if variant == "nomatmul":
                    gates = xp_ref[pl.ds(k, 1)][0]
                elif variant in ("sigtanh", "bf16gates"):
                    hb = h.astype(hh_ref.dtype)
                    rec = jnp.concatenate(
                        [
                            jax.lax.dot_general(
                                hb[r : r + 1], hh_ref[r],
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )
                            for r in range(R)
                        ],
                        axis=0,
                    )
                    gates = xp_ref[pl.ds(k, 1)][0] + rec
                    if variant == "bf16gates":
                        gates = gates.astype(jnp.bfloat16)
                    # exact identity: sigmoid(x) = 0.5*(tanh(x/2)+1)
                    tt = jnp.tanh(0.5 * gates)
                    i = 0.5 * (tt[:, :G] + 1.0).astype(jnp.float32)
                    f = 0.5 * (tt[:, G : 2 * G] + 1.0).astype(jnp.float32)
                    g = jnp.tanh(gates[:, 2 * G : 3 * G]).astype(jnp.float32)
                    o = 0.5 * (tt[:, 3 * G :] + 1.0).astype(jnp.float32)
                    c = f * c + i * g
                    c_s[:] = c
                    h_s[:] = o * jnp.tanh(c)
                    return 0
                elif variant == "colsplit":
                    # VERDICT r3 #2(c): split each chain's (1,G)@(G,4G)
                    # gate matmul into 4 per-gate (1,G)@(G,G) column dots
                    # and run each gate's VPU transcendental right after
                    # its dot — the scheduler can overlap gate math with
                    # the NEXT gate's / chain's MXU pass instead of
                    # waiting for the full 4G row.
                    hb = h.astype(hh_ref.dtype)
                    xk = xp_ref[pl.ds(k, 1)][0]
                    acts = []
                    for col in range(4):
                        rec_c = jnp.concatenate(
                            [
                                jax.lax.dot_general(
                                    hb[r : r + 1],
                                    hh_ref[r, :, col * G : (col + 1) * G],
                                    dimension_numbers=(((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                )
                                for r in range(R)
                            ],
                            axis=0,
                        )  # (R, G)
                        pre = xk[:, col * G : (col + 1) * G] + rec_c
                        acts.append(jnp.tanh(pre) if col == 2 else jax.nn.sigmoid(pre))
                    i, f, g, o = acts
                    c = f * c + i * g
                    c_s[:] = c
                    h_s[:] = o * jnp.tanh(c)
                    return 0
                elif variant == "colsplit2":
                    # same column split but per chain-and-gate fusion
                    # (32 small dots, gate math interleaved at the finest
                    # grain the scheduler can exploit)
                    hb = h.astype(hh_ref.dtype)
                    xk = xp_ref[pl.ds(k, 1)][0]
                    for r in range(R):
                        acts = []
                        for col in range(4):
                            rec_c = jax.lax.dot_general(
                                hb[r : r + 1],
                                hh_ref[r, :, col * G : (col + 1) * G],
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )
                            pre = xk[r : r + 1, col * G : (col + 1) * G] + rec_c
                            acts.append(
                                jnp.tanh(pre) if col == 2 else jax.nn.sigmoid(pre)
                            )
                        i, f, g, o = acts
                        c_r = f * c[r : r + 1] + i * g
                        c_s[r : r + 1] = c_r
                        h_s[r : r + 1] = o * jnp.tanh(c_r)
                    return 0
                elif variant == "recscratch":
                    hb = h.astype(hh_ref.dtype)
                    for r in range(R):
                        rec_s[r : r + 1] = jax.lax.dot_general(
                            hb[r : r + 1], hh_ref[r],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    gates = xp_ref[pl.ds(k, 1)][0] + rec_s[:]
                elif variant == "perchain":
                    hb = h.astype(hh_ref.dtype)
                    xk = xp_ref[pl.ds(k, 1)][0]
                    for r in range(R):
                        rec = jax.lax.dot_general(
                            hb[r : r + 1], hh_ref[r],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        g_r = xk[r : r + 1] + rec  # (1, 4G)
                        i = jax.nn.sigmoid(g_r[:, :G])
                        f = jax.nn.sigmoid(g_r[:, G : 2 * G])
                        gg = jnp.tanh(g_r[:, 2 * G : 3 * G])
                        o = jax.nn.sigmoid(g_r[:, 3 * G :])
                        c_r = f * c[r : r + 1] + i * gg
                        h_s[r : r + 1] = o * jnp.tanh(c_r)
                        c_s[r : r + 1] = c_r
                    return 0
                else:
                    hb = h.astype(hh_ref.dtype)
                    rec = jnp.concatenate(
                        [
                            jax.lax.dot_general(
                                hb[r : r + 1], hh_ref[r],
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )
                            for r in range(R)
                        ],
                        axis=0,
                    )
                    if variant == "nogates":
                        h_s[:] = jnp.tanh(rec[:, :G])
                        c_s[:] = c
                        return 0
                    gates = xp_ref[pl.ds(k, 1)][0] + rec
                i = jax.nn.sigmoid(gates[:, :G])
                f = jax.nn.sigmoid(gates[:, G : 2 * G])
                g = jnp.tanh(gates[:, 2 * G : 3 * G])
                o = jax.nn.sigmoid(gates[:, 3 * G :])
                c = f * c + i * g
                c_s[:] = c
                h_s[:] = o * jnp.tanh(c)
                return 0

            if variant in ("unrollK", "colsplit", "colsplit2"):
                # static unroll (the shipping kernel's winning form)
                for k in range(K):
                    body(k, 0)
            else:
                jax.lax.fori_loop(0, K, body, 0)

            @pl.when(b == pl.num_programs(0) - 1)
            def _():
                hT_ref[:] = h_s[:]

        return kernel

    def build(variant):
        call = pl.pallas_call(
            make_kernel(variant),
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((K, R, G4), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((R, G, G4), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((R, G), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((R, G), lambda b: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, G), lambda b: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, G), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((R, G), jnp.float32),
                pltpu.VMEM((R, G), jnp.float32),
                pltpu.VMEM((R, G4), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )

        @jax.jit
        def many(xp, hh, h0, c0):
            acc = None
            for i in range(3):
                o = call(xp * (1.0 + 1e-7 * i), hh, h0, c0)
                v = jnp.sum(o)
                acc = v if acc is None else acc + v
            return acc

        return many

    import os

    variants = tuple(
        os.environ.get("UMX_PROBE_VARIANTS", "unrollK,colsplit,colsplit2").split(",")
    )
    for variant in variants:
        try:
            fn = build(variant)
            _ = float(fn(xp, hh, h0, c0))
            walls = []
            for _w in range(3):
                t0 = time.perf_counter()
                _ = float(fn(xp, hh, h0, c0))
                walls.append(time.perf_counter() - t0)
            w = sorted(walls)[1] / 3
            print(f"{variant:>9}: {w * 1e3:7.2f} ms/layer  {w / T * 1e6:5.2f} us/step")
        except Exception as e:  # noqa: BLE001
            print(f"{variant:>9}: FAILED {type(e).__name__}: {str(e)[:200]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
