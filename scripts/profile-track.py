#!/usr/bin/env python
"""Fused-track GLUE drill: what does the whole-track scan add per chunk
over the bare segment program?

  segment      inner-rep full segment program (stft+net+wiener+istft)
               — the honest per-chunk floor
  scan4        fused 4-chunk track program / 4 (scan + weight multiply
               + ys stacking + overlap-add + normalize)
  scan4_noola  same but returning the stacked weighted chunks WITHOUT
               overlap-add/normalize — isolates the scan itself
  scan4_slice  scan over PRE-SLICED chunks (no in-scan dynamic_slice)

Per-chunk deltas vs `segment` attribute the glue.
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

    from umx_tpu.config import EngineConfig, SegmentConfig
    from umx_tpu.engine.separator import (
        _demix_fused_impl,
        _overlap_add_chunks,
        _segment_forward_impl,
        _transition_weight,
    )
    from umx_tpu.models.umx import init_lstm_state, synthetic_params

    cfg = EngineConfig(segment=SegmentConfig(segment_secs=60.0))
    dcfg = cfg.dsp
    sr = dcfg.sample_rate
    seg = cfg.segment.segment_samples(sr)
    stride = cfg.segment.stride_samples(sr)
    import os
    K = int(os.environ.get("UMX_PROFILE_CHUNKS", "4"))
    padded = (K - 1) * stride + seg
    rng = np.random.default_rng(0)
    audio_p = jnp.asarray(rng.uniform(-0.5, 0.5, (2, padded)).astype(np.float32))
    chunk = audio_p[:, :seg]
    params = synthetic_params(cfg.model, seed=0)
    state = init_lstm_state(cfg.model)

    def drain(x):
        return float(jnp.sum(jax.tree.leaves(x)[0]))

    def timeit(fn_jit, *a, inner=1, reps=6):
        drain(fn_jit(*a))
        drain(fn_jit(*a))
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(reps):
                out = fn_jit(*a)
            drain(out)
            walls.append((time.perf_counter() - t0) / reps)
        return sorted(walls)[1] / inner

    # inner-rep single segment (chained state like the real scan)
    R = 4

    def seg_many(p, a, st):
        acc = None
        s = st
        for i in range(R):
            out, s = _segment_forward_impl(p, a * (1.0 + 1e-7 * i), s, cfg, seg)
            v = jnp.sum(out)
            acc = v if acc is None else acc + v
        return acc

    t_seg = timeit(jax.jit(seg_many), params, chunk, state, inner=R) * 1000
    print(f"{'segment':>12}: {t_seg:8.2f} ms/chunk")

    # full fused program
    fused = jax.jit(
        lambda p, a, st: _demix_fused_impl(p, a, st, cfg, K, seg, stride)
    )
    t_f = timeit(fused, params, audio_p, state) * 1000 / K
    print(f"{'scan4':>12}: {t_f:8.2f} ms/chunk   (+{t_f - t_seg:6.2f})")

    # scan without the OLA/normalize tail
    def fused_noola(p, a, st):
        weight = _transition_weight(seg, cfg.segment.transition_power)

        def body(s, i):
            c = jax.lax.dynamic_slice(a, (0, i * stride), (2, seg))
            out, ns = _segment_forward_impl(p, c, s, cfg, seg)
            return ns, weight * out

        _, ys = jax.lax.scan(body, st, jnp.arange(K))
        return ys

    t_n = timeit(jax.jit(fused_noola), params, audio_p, state) * 1000 / K
    print(f"{'scan4_noola':>12}: {t_n:8.2f} ms/chunk   (+{t_n - t_seg:6.2f})")

    # scan over pre-sliced chunks (no dynamic_slice inside)
    chunks = jnp.stack(
        [audio_p[:, k * stride : k * stride + seg] for k in range(K)]
    )

    def fused_presliced(p, cs, st):
        weight = _transition_weight(seg, cfg.segment.transition_power)

        def body(s, c):
            out, ns = _segment_forward_impl(p, c, s, cfg, seg)
            return ns, weight * out

        _, ys = jax.lax.scan(body, st, cs)
        return ys

    t_p = timeit(jax.jit(fused_presliced), params, chunks, state) * 1000 / K
    print(f"{'scan4_slice':>12}: {t_p:8.2f} ms/chunk   (+{t_p - t_seg:6.2f})")

    # OLA alone at this scale
    ys = jnp.asarray(rng.standard_normal((K, 4, 2, seg)).astype(np.float32))

    def ola(y):
        out = _overlap_add_chunks(y, stride, padded)
        w = _transition_weight(seg, cfg.segment.transition_power)
        sw = _overlap_add_chunks(jnp.broadcast_to(w, (K, seg)), stride, padded)
        return out / sw

    t_o = timeit(jax.jit(ola), ys) * 1000 / K
    print(f"{'ola_alone':>12}: {t_o:8.2f} ms/chunk")
    return 0


if __name__ == "__main__":
    sys.exit(main())
