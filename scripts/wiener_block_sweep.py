#!/usr/bin/env python
"""In-context Wiener time_block sweep (round 3).

Hypothesis: the shipped time_block=8 (chosen in round 2 to avoid
evicting the *scan* BLSTM's VMEM-resident weights) leaves per-grid-step
overhead on the table now that the recurrence runs in the merged Pallas
kernel (which DMAs its own weights per call, so there is nothing
persistent to evict).  At TB=8 the two passes walk ~650 grid steps per
segment; a fixed ~2 µs/step overhead would explain the measured
1.94 ms vs the ~0.8 ms traffic floor.

Measures the FULL segment program (stft+net+wiener+istft) per
time_block so any eviction side effect on the recurrence shows up, plus
a no-wiener baseline for the in-context delta.  Timing per the repo's
methodology: N pipelined dispatches per window, one drain.
"""

from __future__ import annotations

import dataclasses
import json
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
    from umx_tpu.engine import separator as sep
    from umx_tpu.models.umx import init_lstm_state, synthetic_params

    base = EngineConfig(segment=SegmentConfig(segment_secs=60.0))
    n = base.segment.segment_samples(base.dsp.sample_rate)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.uniform(-0.5, 0.5, (2, n)).astype(np.float32))
    params = synthetic_params(base.model, seed=0)
    state = init_lstm_state(base.model)

    def timeit(cfg, reps=20):
        out = sep.segment_forward(params, audio, state, cfg, n)
        jax.block_until_ready(out)
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            o = None
            for _ in range(reps):
                o = sep.segment_forward(params, audio, state, cfg, n)
            float(jnp.sum(o[0]))
            walls.append((time.perf_counter() - t0) / reps)
        return sorted(walls)[1] * 1e3

    rows = {}
    nw = dataclasses.replace(base, use_wiener=False)
    rows["no_wiener"] = timeit(nw)
    print(f"no_wiener: {rows['no_wiener']:.2f} ms", flush=True)
    for tb in (8, 16, 32, 64, 128):
        cfg = dataclasses.replace(
            base, wiener=dataclasses.replace(base.wiener, time_block=tb)
        )
        rows[f"tb{tb}"] = timeit(cfg)
        delta = rows[f"tb{tb}"] - rows["no_wiener"]
        print(f"tb={tb}: {rows[f'tb{tb}']:.2f} ms (wiener in-context {delta:.2f})",
              flush=True)
    print(json.dumps(rows))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
