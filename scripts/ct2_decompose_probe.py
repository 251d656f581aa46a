#!/usr/bin/env python
"""Decompose the ct2 iSTFT's on-chip cost into its passes.

Round-3 finding: istft[ct2_xla] measured 15.55 ms vs dense 13.89 — both
~90 GB/s, i.e. the CT math is FLOP-cheap but the pipeline is stuck on
layout passes.  This probe times each pass in isolation at the
production segment shape (8 planes x T=2584 x F=2049):

  layout    — ct2_layout: fold weights + pad + (T,2C,N1)->(2C,N1,T)
              transpose (the ONE relayout of the design)
  stages_p  — the two Pallas kernels from pre-laid-out v
  ola_perm  — overlap_add_perm from the permuted frames
  e2e_ct2   — full istft_planes(istft_algo="ct2")
  e2e_dense — full istft_planes dense (baseline)

Timing per the axon rules (PERF.md): N pipelined calls, one drain.
"""

from __future__ import annotations

import functools
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

    from umx_tpu.config import DSPConfig
    from umx_tpu.ops import istft_ct, stft as stft_ops

    dcfg = DSPConfig(fft_impl="matmul")
    n = int(60.0 * 44100)
    T = dcfg.n_frames(n)
    F = dcfg.n_bins
    S = 4
    n_fft = dcfg.n_fft
    win = stft_ops.hann_window(n_fft)
    rng = np.random.default_rng(0)
    sre = jnp.asarray(rng.standard_normal((S, 2, T, F)).astype(np.float32))
    sim = jnp.asarray(rng.standard_normal((S, 2, T, F)).astype(np.float32))
    print(f"# ct2 decompose: T={T} F={F} planes={2*S}", file=sys.stderr)

    def timeit(fn, *args, reps=6):
        out = fn(*args)
        jax.block_until_ready(out)
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            acc = None
            for i in range(reps):
                o = fn(*(a * (1.0 + 1e-7 * i) if hasattr(a, "dtype") else a for a in args))
                leaf = jax.tree.leaves(o)[0]
                v = jnp.sum(leaf[..., :1])
                acc = v if acc is None else acc + v
            float(acc)
            walls.append((time.perf_counter() - t0) / reps)
        return sorted(walls)[1]

    def report(name, s):
        print(f"{name:>12}: {s*1e3:8.2f} ms")

    # A/B. fully-fused kernel (assembly + stages + in-kernel OLA) per kf
    for kf in (8, 16, 32):
        f_k = jax.jit(
            functools.partial(
                istft_ct.istft_ct2_fused,
                n_fft=n_fft, hop=dcfg.hop, window=win, kf=kf, interpret=False,
            )
        )
        try:
            report(f"fused[kf{kf}]", timeit(f_k, sre, sim))
        except Exception as e:  # noqa: BLE001
            print(f"fused[kf{kf}] FAILED {type(e).__name__}: {str(e)[:200]}")

    # D/E. e2e istft
    import dataclasses

    for algo in ("ct2", "dense"):
        c = dataclasses.replace(dcfg, istft_algo=algo)
        fn = jax.jit(lambda re, im, c=c: stft_ops.istft_planes(re, im, n, c))
        try:
            report(f"e2e_{algo}", timeit(fn, sre, sim))
        except Exception as e:  # noqa: BLE001
            print(f"e2e_{algo} FAILED {type(e).__name__}: {str(e)[:300]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
