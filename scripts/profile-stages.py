#!/usr/bin/env python
"""Per-stage device timing of the segment pipeline (STFT / network /
Wiener / iSTFT) to target optimization work.  Run on the TPU:

    python scripts/profile-stages.py [seg_secs] [reps]

Each stage is jitted separately and timed with scalar-fetch barriers
(block_until_ready is not a barrier on the axon backend).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> int:
    seg_secs = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/umx_tpu_xla_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from umx_tpu.config import EngineConfig, SegmentConfig
    from umx_tpu.models.umx import init_lstm_state, synthetic_params, umx_forward
    from umx_tpu.ops import stft as stft_ops
    from umx_tpu.ops.wiener import wiener_filter
    from umx_tpu.engine.separator import apply_masks, crop_stack

    cfg = EngineConfig(segment=SegmentConfig(segment_secs=seg_secs))
    n = cfg.segment.segment_samples(cfg.dsp.sample_rate)
    params = synthetic_params(cfg.model, seed=0)
    state = init_lstm_state(cfg.model)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.uniform(-0.5, 0.5, (2, n)).astype(np.float32))

    print(f"# backend={jax.default_backend()} segment={seg_secs}s reps={reps}")

    f_stft = jax.jit(lambda a: stft_ops.stft(a, cfg.dsp))
    # params must be an ARGUMENT: closed-over arrays become inline
    # constants and blow past the remote-compile request size limit
    f_net_impl = jax.jit(
        lambda p, mag, st: umx_forward(
            p, crop_stack(mag, cfg.model.nb_bins_cropped), st, cfg.model,
            cfg.matmul_precision,
        )
    )
    f_net = lambda mag, st: f_net_impl(params, mag, st)  # noqa: E731
    f_wiener = jax.jit(
        lambda spec, masks, mag: wiener_filter(
            spec, apply_masks(masks, mag, cfg.model.n_bins), cfg.wiener
        )
    )
    f_istft = jax.jit(lambda specs: stft_ops.istft(specs, n, cfg.dsp))

    def drain(x):
        leaf = jax.tree.leaves(x)[0]
        return float(jnp.sum(jnp.abs(leaf).astype(jnp.float32)))

    def timeit(name, fn, *args):
        out = fn(*args)
        drain(out)  # compile + drain
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        drain(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:<10} {dt * 1000:8.2f} ms/segment")
        return out, dt

    spec, t1 = timeit("stft", f_stft, audio)
    mag = jnp.abs(spec)
    (masks, _), t2 = timeit("network", f_net, mag, state)
    tspec, t3 = timeit("wiener", f_wiener, spec, masks, mag)
    _, t4 = timeit("istft", f_istft, tspec)

    total = t1 + t2 + t3 + t4
    print(f"{'total':<10} {total * 1000:8.2f} ms -> {seg_secs / total:.0f} xRT (sum of stages)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
