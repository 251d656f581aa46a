#!/usr/bin/env python
"""Isolated A/B of the fused-track overlap-add implementations at track
scale: XLA pad+sum, Pallas DMA transpose, XLA dynamic-update-slice.

Inner-rep timing (N applications per program, inputs perturbed) so the
per-dispatch tunnel overhead cancels."""

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
    from umx_tpu.engine.separator import _overlap_add_chunks, _transition_weight
    from umx_tpu.ops.ola_pallas import overlap_add_normalized

    cfg = EngineConfig()
    sr = cfg.dsp.sample_rate
    seg = cfg.segment.segment_samples(sr)
    stride = cfg.segment.stride_samples(sr)
    n_chunks = int(os.environ.get("UMX_PROFILE_CHUNKS", "9"))
    padded_len = (n_chunks - 1) * stride + seg
    M = (4, 2)

    rng = np.random.default_rng(0)
    ys = jnp.asarray(rng.standard_normal((n_chunks, *M, seg)).astype(np.float32))
    weight = _transition_weight(seg, 1.0)
    sw = _overlap_add_chunks(jnp.broadcast_to(weight, (n_chunks, seg)), stride, padded_len)
    inv_sw = 1.0 / sw
    _ = float(jnp.sum(ys))

    R = 4

    def run(label, fn):
        @jax.jit
        def many(y):
            acc = None
            for i in range(R):
                o = fn(y * (1.0 + 1e-7 * i))
                v = jnp.sum(o)
                acc = v if acc is None else acc + v
            return acc

        _ = float(many(ys))
        walls = []
        for _w in range(3):
            t0 = time.perf_counter()
            _ = float(many(ys))
            walls.append(time.perf_counter() - t0)
        w = sorted(walls)[1] / R
        gb = 2 * ys.size * 4 / 1e9
        print(f"{label:>9}: {w * 1e3:7.2f} ms  ({gb / w:5.0f} GB/s eff)")

    def unroll(y):
        out = jnp.zeros((*M, padded_len), jnp.float32)
        for k in range(n_chunks):
            out = out.at[..., k * stride : k * stride + seg].add(y[k])
        return out * inv_sw

    run("unroll", unroll)
    run("xla", lambda y: _overlap_add_chunks(y, stride, padded_len) / sw)
    run(
        "pallas",
        lambda y: overlap_add_normalized(y, inv_sw, stride, padded_len, impl="pallas"),
    )
    run(
        "xla_dus",
        lambda y: overlap_add_normalized(y, inv_sw, stride, padded_len, impl="xla_dus"),
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
