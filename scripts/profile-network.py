#!/usr/bin/env python
"""In-context NETWORK drill: why does umx_forward cost more composed
after stft+mag than isolated?  (round-2 ROADMAP item; sibling of
profile-wiener.py which settled the Wiener side.)

Stages (inner-rep timing, perturbed inputs, one jitted program each):

  net          umx_forward on a precomputed (T, F_in) input — isolated
  stftmag      stft_planes + magnitude + crop_stack only
  comp         stftmag -> net composed (re/im planes also returned,
               as in the real segment program where Wiener needs them)
  comp_nolive  composed but ONLY the masks returned — tests whether
               keeping the spectrogram planes live across the scans
               is what slows them down
  comp_barrier composed with an optimization_barrier between the crop
               and the network — tests scheduling/fusion interplay
"""

from __future__ import annotations

import os
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

    from umx_tpu.config import EngineConfig, SegmentConfig
    from umx_tpu.engine.separator import crop_stack
    from umx_tpu.models.umx import init_lstm_state, synthetic_params, umx_forward
    from umx_tpu.ops import stft as stft_ops

    cfg = EngineConfig(segment=SegmentConfig(segment_secs=60.0))
    mcfg, dcfg = cfg.model, cfg.dsp
    n = cfg.segment.segment_samples(dcfg.sample_rate)
    T = dcfg.n_frames(n)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.uniform(-0.5, 0.5, (2, n)).astype(np.float32))
    x_pre = jnp.asarray(rng.uniform(0, 1, (T, mcfg.n_features)).astype(np.float32))
    params = synthetic_params(mcfg, seed=0)
    state = init_lstm_state(mcfg)

    R_INNER = int(os.environ.get("UMX_INNER", "4"))
    REPS = int(os.environ.get("UMX_REPS", "8"))

    def drain(x):
        return float(jnp.sum(jax.tree.leaves(x)[0]))

    def timeit(stage, *a):
        def many(*a):
            acc = None
            for i in range(R_INNER):
                pert = tuple(
                    x * (1.0 + 1e-7 * (i + 1))
                    if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.floating)
                    else x
                    for x in a
                )
                out = stage(*pert)
                s = jnp.sum(jax.tree.leaves(out)[0])
                acc = s if acc is None else acc + s
            return acc

        fn = jax.jit(many)
        drain(fn(*a))
        drain(fn(*a))
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(REPS):
                out = fn(*a)
            drain(out)
            walls.append((time.perf_counter() - t0) / REPS)
        return sorted(walls)[1] / R_INNER

    def net(p, xx, st):
        masks, _ = umx_forward(p, xx, st, mcfg, cfg.matmul_precision)
        return masks

    def stftmag(a):
        re, im = stft_ops.stft_planes(a, dcfg)
        mag = jnp.sqrt(re * re + im * im)
        return crop_stack(mag, mcfg.nb_bins_cropped)

    def comp(p, a, st):
        re, im = stft_ops.stft_planes(a, dcfg)
        mag = jnp.sqrt(re * re + im * im)
        x = crop_stack(mag, mcfg.nb_bins_cropped)
        masks, _ = umx_forward(p, x, st, mcfg, cfg.matmul_precision)
        return masks, re, im

    def comp_nolive(p, a, st):
        re, im = stft_ops.stft_planes(a, dcfg)
        mag = jnp.sqrt(re * re + im * im)
        x = crop_stack(mag, mcfg.nb_bins_cropped)
        masks, _ = umx_forward(p, x, st, mcfg, cfg.matmul_precision)
        return masks

    def comp_barrier(p, a, st):
        re, im = stft_ops.stft_planes(a, dcfg)
        mag = jnp.sqrt(re * re + im * im)
        x = crop_stack(mag, mcfg.nb_bins_cropped)
        x = jax.lax.optimization_barrier(x)
        masks, _ = umx_forward(p, x, st, mcfg, cfg.matmul_precision)
        return masks, re, im

    t_net = timeit(net, params, x_pre, state) * 1000
    print(f"{'net':>13}: {t_net:8.2f} ms")
    t_sm = timeit(stftmag, audio) * 1000
    print(f"{'stftmag':>13}: {t_sm:8.2f} ms   (sum parts = {t_net + t_sm:.2f})")
    for name, fn in (("comp", comp), ("comp_nolive", comp_nolive),
                     ("comp_barrier", comp_barrier)):
        ms = timeit(fn, params, audio, state) * 1000
        print(f"{name:>13}: {ms:8.2f} ms   (+{ms - t_net - t_sm:6.2f} vs parts)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
