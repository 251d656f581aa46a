#!/usr/bin/env python
"""Locate composition overhead in the fused segment program: time
cumulative PREFIXES of the pipeline (inner-rep timing) and report the
marginal cost of each stage IN CONTEXT, vs the isolated-stage numbers
from scripts/roofline.py."""

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
    from umx_tpu.engine.separator import apply_masks, crop_stack
    from umx_tpu.models.umx import init_lstm_state, synthetic_params, umx_forward
    from umx_tpu.ops import stft as stft_ops
    from umx_tpu.ops.wiener import wiener_filter_masks

    seg_secs = float(os.environ.get("UMX_PROF_SECS", "60"))
    cfg = EngineConfig(segment=SegmentConfig(segment_secs=seg_secs))
    mcfg, dcfg = cfg.model, cfg.dsp
    n = cfg.segment.segment_samples(dcfg.sample_rate)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.uniform(-0.5, 0.5, (2, n)).astype(np.float32))
    params = synthetic_params(mcfg, seed=0)
    state = init_lstm_state(mcfg)

    R = int(os.environ.get("UMX_PROF_INNER", "6"))
    reps = int(os.environ.get("UMX_PROF_REPS", "8"))

    def drain(x):
        return float(jnp.sum(jax.tree.leaves(x)[0]))

    def timeit(stage, *a):
        def many(*a):
            acc = None
            for i in range(R):
                pert = tuple(
                    x * (1.0 + 1e-7 * (i + 1))
                    if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.floating)
                    else x
                    for x in a
                )
                s = jnp.sum(jax.tree.leaves(stage(*pert))[0])
                acc = s if acc is None else acc + s
            return acc

        fn = jax.jit(many)
        drain(fn(*a))
        drain(fn(*a))
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(reps):
                out = fn(*a)
            drain(out)
            walls.append((time.perf_counter() - t0) / reps)
        return sorted(walls)[1] / R

    def p_stft(p, a, st):
        return stft_ops.stft_planes(a, dcfg)

    def p_mag(p, a, st):
        re, im = stft_ops.stft_planes(a, dcfg)
        return jnp.sqrt(re * re + im * im)

    def p_net(p, a, st):
        re, im = stft_ops.stft_planes(a, dcfg)
        mag = jnp.sqrt(re * re + im * im)
        x = crop_stack(mag, mcfg.nb_bins_cropped)
        masks, new_state = umx_forward(p, x, st, mcfg, cfg.matmul_precision)
        return masks

    def p_masks(p, a, st):
        re, im = stft_ops.stft_planes(a, dcfg)
        mag = jnp.sqrt(re * re + im * im)
        x = crop_stack(mag, mcfg.nb_bins_cropped)
        masks, new_state = umx_forward(p, x, st, mcfg, cfg.matmul_precision)
        return apply_masks(masks, mag, mcfg.n_bins)

    def p_wiener(p, a, st):
        re, im = stft_ops.stft_planes(a, dcfg)
        mag = jnp.sqrt(re * re + im * im)
        x = crop_stack(mag, mcfg.nb_bins_cropped)
        masks, new_state = umx_forward(p, x, st, mcfg, cfg.matmul_precision)
        return wiener_filter_masks(re, im, masks, mcfg.n_bins, cfg.wiener)

    def p_full(p, a, st):
        re, im = stft_ops.stft_planes(a, dcfg)
        mag = jnp.sqrt(re * re + im * im)
        x = crop_stack(mag, mcfg.nb_bins_cropped)
        masks, new_state = umx_forward(p, x, st, mcfg, cfg.matmul_precision)
        tre, tim = wiener_filter_masks(re, im, masks, mcfg.n_bins, cfg.wiener)
        return stft_ops.istft_planes(tre, tim, n, dcfg)

    prefixes = [
        ("stft", p_stft),
        ("+mag", p_mag),
        ("+net", p_net),
        ("+apply_masks", p_masks),
        ("+wiener", p_wiener),
        ("+istft(full)", p_full),
    ]
    prev = 0.0
    print(f"# prefix profile: seg={seg_secs}s inner={R}", file=sys.stderr)
    for name, fn in prefixes:
        ms = timeit(fn, params, audio, state) * 1000
        print(f"{name:>14}: cum {ms:8.2f} ms   marginal {ms - prev:8.2f} ms")
        prev = ms
    return 0


if __name__ == "__main__":
    sys.exit(main())
