#!/usr/bin/env python
"""Attribute the Separator.demix wrapper cost over the raw fused program.

  raw      _demix_fused_jit on PRE-PADDED device audio, fresh zero state
  nopad    raw + the output [..., :length] slice (the wrapper's tail)
  wrapper  Separator.demix(track_dev) — adds device pad + slice + python

Steady-state timing: reps pipelined calls, ONE scalar drain per window.
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
    import math
    import os

    import jax.numpy as jnp
    import numpy as np

    from umx_tpu.config import EngineConfig
    from umx_tpu.engine.separator import Separator, demix_fused
    from umx_tpu.models.umx import init_lstm_state, synthetic_params

    cfg = EngineConfig()
    sr = cfg.dsp.sample_rate
    seg = cfg.segment.segment_samples(sr)
    stride = cfg.segment.stride_samples(sr)
    track_secs = float(os.environ.get("UMX_PROFILE_TRACK_SECS", "420"))
    length = int(track_secs * sr)
    n_chunks = max(1, math.ceil(length / stride))
    padded = (n_chunks - 1) * stride + seg

    rng = np.random.default_rng(0)
    params = synthetic_params(cfg.model, seed=0)
    audio = jax.device_put(
        jnp.asarray(rng.uniform(-0.5, 0.5, (2, length)).astype(np.float32))
    )
    audio_p = jnp.pad(audio, ((0, 0), (0, padded - length)))
    _ = float(jnp.sum(audio_p))
    state0 = init_lstm_state(cfg.model)
    sep = Separator(params, cfg)

    def timeit(label, fn, reps=6):
        out = fn()
        _ = float(jnp.sum(out))
        walls = []
        for _w in range(3):
            t0 = time.perf_counter()
            for _r in range(reps):
                out = fn()
            _ = float(jnp.sum(out))
            walls.append((time.perf_counter() - t0) / reps)
        w = sorted(walls)[1]
        print(f"{label:>8}: {w * 1e3:7.1f} ms/track -> {track_secs / w:6.1f}x")
        return w

    def raw():
        st = jax.tree.map(jnp.zeros_like, state0)
        out, _st = demix_fused(params, audio_p, st, cfg, n_chunks, seg, stride)
        return out

    def nopad():
        return raw()[..., :length]

    timeit("raw", raw)
    timeit("nopad", nopad)
    timeit("wrapper", lambda: sep.demix(audio))
    return 0


if __name__ == "__main__":
    sys.exit(main())
