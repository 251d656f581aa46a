#!/usr/bin/env python
"""Attribution drill for the split-phase streaming track program
(demix_fused_stream_groups): where does its per-chunk time go, and why
did the first cut measure SLOWER (46.5 ms/chunk) than the plain chained
scan (43) when its phases unchained sum to ~34?

Times, at K chunks / width-cb groups (60 s segments, headline shape):

  scanK        the sequential lax.scan track program (reference point)
  groupsK      the full split-phase program
  groups_noola groupsK without the overlap-add/normalize tail
  gbody        ONE group body (pre.vmap + chained recurrences + post.vmap)
  preA         batched pre half alone (vmap width cb), per chunk
  recB         cb chained recurrences alone, per chunk
  postC        batched post half alone (vmap width cb), per chunk
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
    from umx_tpu.engine.separator import (
        _demix_fused_impl,
        _demix_fused_stream_groups_jit,
        _segment_post_impl,
        _segment_pre_impl,
    )
    from umx_tpu.models.umx import init_lstm_state, synthetic_params, umx_recurrence

    cfg = EngineConfig(segment=SegmentConfig(segment_secs=60.0))
    sr = cfg.dsp.sample_rate
    seg = cfg.segment.segment_samples(sr)
    stride = cfg.segment.stride_samples(sr)
    K = int(os.environ.get("UMX_PROFILE_CHUNKS", "8"))
    CB = int(os.environ.get("UMX_PROFILE_CB", "4"))
    padded = (K - 1) * stride + seg
    rng = np.random.default_rng(0)
    audio_p = jnp.asarray(rng.uniform(-0.5, 0.5, (2, padded)).astype(np.float32))
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

    skip_front = os.environ.get("UMX_PROFILE_SKIP_FRONT", "0") != "0"

    # reference scan program
    if not skip_front:
        scan = jax.jit(lambda p, a, st: _demix_fused_impl(p, a, st, cfg, K, seg, stride))
        t = timeit(scan, params, audio_p, state) * 1000 / K
        print(f"{'scanK':>12}: {t:8.2f} ms/chunk")

    # full split-phase program (no donation in this drill)
    def groups(p, a, st):
        return _demix_fused_stream_groups_jit.__wrapped__(p, a, st, cfg, K, seg, stride, CB)

    if not skip_front:
        t = timeit(jax.jit(groups), params, audio_p, state) * 1000 / K
        print(f"{'groupsK':>12}: {t:8.2f} ms/chunk")

    # without the OLA tail
    from umx_tpu.engine.separator import _transition_weight

    def groups_noola(p, a, st):
        weight = _transition_weight(seg, cfg.segment.transition_power)
        ys = []
        s = st
        for g in range(-(-K // CB)):
            k0 = g * CB
            width = min(CB, K - k0)
            chunks = jnp.stack(
                [jax.lax.dynamic_slice(a, (0, k * stride), (2, seg)) for k in range(k0, k0 + width)]
            )
            res, ims, x1s = jax.vmap(lambda c: _segment_pre_impl(p, c, cfg))(chunks)
            outs = []
            for k in range(width):
                lo, s = umx_recurrence(p, x1s[k], s, cfg.model, cfg.matmul_precision)
                outs.append(lo)
            los = jnp.stack(outs)
            waves = jax.vmap(
                lambda r, i, x1, lo: _segment_post_impl(p, r, i, x1, lo, cfg, seg)
            )(res, ims, x1s, los)
            ys.append(weight * waves)
        return ys

    if not skip_front:
        t = timeit(jax.jit(groups_noola), params, audio_p, state) * 1000 / K
        print(f"{'groups_noola':>12}: {t:8.2f} ms/chunk")

    # one group body, inner-rep chained
    chunks0 = jnp.stack(
        [audio_p[:, k * stride : k * stride + seg] for k in range(CB)]
    )
    R = 3

    def gbody(p, cs, st):
        acc = None
        s = st
        for r in range(R):
            csr = cs * (1.0 + 1e-7 * r)
            res, ims, x1s = jax.vmap(lambda c: _segment_pre_impl(p, c, cfg))(csr)
            outs = []
            for k in range(CB):
                lo, s = umx_recurrence(p, x1s[k], s, cfg.model, cfg.matmul_precision)
                outs.append(lo)
            los = jnp.stack(outs)
            waves = jax.vmap(
                lambda rr, ii, x1, lo: _segment_post_impl(p, rr, ii, x1, lo, cfg, seg)
            )(res, ims, x1s, los)
            v = jnp.sum(waves)
            acc = v if acc is None else acc + v
        return acc

    if not skip_front:
        t = timeit(jax.jit(gbody), params, chunks0, state, inner=R) * 1000 / CB
        print(f"{'gbody':>12}: {t:8.2f} ms/chunk")

    # phase A alone
    def preA(p, cs):
        acc = None
        for r in range(R):
            res, ims, x1s = jax.vmap(lambda c: _segment_pre_impl(p, c, cfg))(cs * (1.0 + 1e-7 * r))
            v = jnp.sum(x1s) + jnp.sum(res)
            acc = v if acc is None else acc + v
        return acc

    t_a = timeit(jax.jit(preA), params, chunks0, inner=R) * 1000 / CB
    print(f"{'preA':>12}: {t_a:8.2f} ms/chunk")

    # phase B alone (chained)
    mcfg = cfg.model
    # take real x1s once
    _, _, x1s_const = jax.jit(
        lambda p, cs: jax.vmap(lambda c: _segment_pre_impl(p, c, cfg))(cs)
    )(params, chunks0)

    def recB(p, x1s, st):
        acc = None
        s = st
        for r in range(R):
            for k in range(CB):
                lo, s = umx_recurrence(p, x1s[k] * (1.0 + 1e-7 * r), s, mcfg, cfg.matmul_precision)
                v = jnp.sum(lo)
                acc = v if acc is None else acc + v
        return acc

    t_b = timeit(jax.jit(recB), params, x1s_const, state, inner=R) * 1000 / CB
    print(f"{'recB':>12}: {t_b:8.2f} ms/chunk")

    # phase B UNCHAINED (every chunk gets the same initial state) —
    # isolates the cost of the state chain vs the per-call structure
    def recB_unchained(p, x1s, st):
        acc = None
        for r in range(R):
            for k in range(CB):
                lo, _ = umx_recurrence(p, x1s[k] * (1.0 + 1e-7 * (r * CB + k)), st, mcfg, cfg.matmul_precision)
                v = jnp.sum(lo)
                acc = v if acc is None else acc + v
        return acc

    t_bu = timeit(jax.jit(recB_unchained), params, x1s_const, state, inner=R) * 1000 / CB
    print(f"{'recB_unchain':>12}: {t_bu:8.2f} ms/chunk")

    # phase B batch-native (all CB chunks folded into kernel rows via the
    # custom_vmap rule; NON-streaming semantics — the upper bound)
    def recB_folded(p, x1s, st):
        acc = None
        sts = jax.tree.map(lambda x: jnp.broadcast_to(x, (CB, *x.shape)), st)
        for r in range(R):
            los, _ = jax.vmap(
                lambda x1, s: umx_recurrence(p, x1, s, mcfg, cfg.matmul_precision)
            )(x1s * (1.0 + 1e-7 * r), sts)
            v = jnp.sum(los)
            acc = v if acc is None else acc + v
        return acc

    t_bf = timeit(jax.jit(recB_folded), params, x1s_const, state, inner=R) * 1000 / CB
    print(f"{'recB_folded':>12}: {t_bf:8.2f} ms/chunk")

    # phase C alone
    res_c, ims_c, x1s_c = jax.jit(
        lambda p, cs: jax.vmap(lambda c: _segment_pre_impl(p, c, cfg))(cs)
    )(params, chunks0)
    los_c = jax.jit(
        lambda p, x1s, st: jnp.stack(
            [umx_recurrence(p, x1s[k], st, mcfg, cfg.matmul_precision)[0] for k in range(CB)]
        )
    )(params, x1s_c, state)

    def postC(p, res, ims, x1s, los):
        acc = None
        for r in range(R):
            waves = jax.vmap(
                lambda rr, ii, x1, lo: _segment_post_impl(p, rr, ii, x1, lo, cfg, seg)
            )(res * (1.0 + 1e-7 * r), ims, x1s, los)
            v = jnp.sum(waves)
            acc = v if acc is None else acc + v
        return acc

    t_c = timeit(jax.jit(postC), params, res_c, ims_c, x1s_c, los_c, inner=R) * 1000 / CB
    print(f"{'postC':>12}: {t_c:8.2f} ms/chunk")
    print(f"{'A+B+C':>12}: {t_a + t_b + t_c:8.2f} ms/chunk")
    return 0


if __name__ == "__main__":
    sys.exit(main())
