#!/usr/bin/env python
"""Long-track robustness: demix a 30-minute track through the fused
program on real hardware (the reference's 'Georgia Wonder - Siren'
memory-test story, README.md:46-54, at 4x the length).

Checks: the HBM planner's single-track estimate admits the length, the
program compiles and runs, output is finite, stems sum to the mix
(corr ~= 1 with Wiener EM), and reports xRT.
"""

from __future__ import annotations

import math
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

    from umx_tpu.config import EngineConfig
    from umx_tpu.engine.memory import V5E_HBM_BYTES, fused_track_hbm_bytes
    from umx_tpu.engine.separator import Separator
    from umx_tpu.models.umx import synthetic_params

    track_secs = float(os.environ.get("UMX_PROBE_TRACK_SECS", "1800"))
    cfg = EngineConfig()
    est = fused_track_hbm_bytes(cfg, 1, track_secs)
    print(
        f"# planner: {est['total'] / 2**30:.2f} GiB estimated of "
        f"{V5E_HBM_BYTES / 2**30:.2f} GiB for {track_secs:.0f}s",
        file=sys.stderr,
    )

    sr = cfg.dsp.sample_rate
    rng = np.random.default_rng(0)
    # band-limited-ish content: sum of tones + noise, stereo
    t = np.arange(int(track_secs * sr)) / sr
    sig = (
        0.3 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 554 * t)
        + 0.05 * rng.standard_normal(t.size)
    ).astype(np.float32)
    audio = np.stack([sig, np.roll(sig, 441)])
    sep = Separator(synthetic_params(cfg.model, seed=0), cfg)

    dev = jax.device_put(jnp.asarray(audio))
    _ = float(jnp.sum(dev))
    t0 = time.perf_counter()
    out = sep.demix(dev)
    _ = float(jnp.sum(out))
    print(f"# compile+first: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    out = sep.demix(dev)
    s = jnp.sum(out)
    _ = float(s)
    wall = time.perf_counter() - t0
    stems = np.asarray(out)
    assert np.isfinite(stems).all(), "non-finite stems"
    mix_sum = stems.sum(axis=0)
    corr = np.corrcoef(mix_sum.ravel(), audio.ravel())[0, 1]
    n_chunks = math.ceil(audio.shape[1] / cfg.segment.stride_samples(sr))
    print(
        f"longtrack {track_secs:.0f}s: {n_chunks} chunks, xRT={track_secs / wall:.0f}, "
        f"corr(sum stems, mix)={corr:.6f}, finite=True"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
