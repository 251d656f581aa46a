#!/usr/bin/env python
"""On-hardware evidence for the two subsystems the xRT headline doesn't
cover: the trainer (steps/s on the active backend) and the streaming
demixer (per-push latency, segment-boundary latency).

  python scripts/profile-train-stream.py [--hidden 512] [--steps 12]
         [--batch 4] [--seq-len 256] [--stream-secs 120]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--hidden", type=int, default=512)
    p.add_argument("--steps", type=int, default=12)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--seq-len", type=int, default=256)
    p.add_argument("--stream-secs", type=float, default=120.0)
    p.add_argument("--segment-secs", type=float, default=60.0)
    p.add_argument(
        "--lstm-impl", default="auto", choices=("auto", "scan", "pallas_merged"),
        help="recurrence impl for the trainer A/B: auto resolves to the "
        "merged kernel (custom VJP) on TPU, the lax.scan elsewhere",
    )
    p.add_argument("--skip-stream", action="store_true")
    args = p.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/umx_tpu_xla_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import numpy as np

    from umx_tpu.config import DSPConfig, EngineConfig, ModelConfig, SegmentConfig
    from umx_tpu.models.umx import synthetic_params
    from umx_tpu.train import (
        TrainConfig,
        init_train_state,
        make_batch_from_audio,
        make_train_step,
    )

    print(f"# backend: {jax.default_backend()}", file=sys.stderr)

    # ---- trainer ------------------------------------------------------------
    mcfg = ModelConfig(hidden_size=args.hidden, lstm_impl=args.lstm_impl)
    tcfg = TrainConfig(seq_len=args.seq_len)
    dsp = DSPConfig()
    rng = np.random.default_rng(0)
    n = dsp.hop * (args.seq_len - 1)
    mix = rng.standard_normal((args.batch, 2, n)).astype(np.float32) * 0.1
    targets = rng.standard_normal((args.batch, 4, 2, n)).astype(np.float32) * 0.05
    batch = make_batch_from_audio(mix, targets, mcfg, dsp, args.seq_len)

    state = init_train_state(synthetic_params(mcfg, seed=0), tcfg)
    step = jax.jit(make_train_step(mcfg, tcfg), donate_argnums=(0,))
    t0 = time.perf_counter()
    state, loss = step(state, batch)
    first = float(loss)
    print(f"# train compile+first: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    losses = [first]
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, loss = step(state, batch)
        losses.append(float(loss))  # scalar fetch = per-step barrier
    wall = time.perf_counter() - t0
    sps = args.steps / wall
    audio_sps = sps * args.batch * n / dsp.sample_rate
    # matmul-FLOPs model: every matmul weight is applied once per frame
    # per direction-instance, so fwd FLOPs ~= 2 * B * T * sum(matmul
    # weight sizes); a training step ~= 3x fwd (forward + input-grad +
    # weight-grad matmuls).  MFU against the v5e bf16 peak (197 TF/s).
    h, g = mcfg.hidden_size, mcfg.lstm_hidden
    mat = mcfg.n_targets * (
        mcfg.n_features * h
        + 2 * (h * 4 * g + 2 * (2 * g * 4 * g)) + 2 * 3 * (g * 4 * g)
        + 2 * h * h + h * mcfg.n_outputs
    )
    flops_step = 3 * 2 * args.batch * args.seq_len * mat
    peak = 197e12 if jax.default_backend() == "tpu" else float("nan")
    mfu = flops_step * sps / peak
    print(
        f"train[h={args.hidden} B={args.batch} T={args.seq_len} "
        f"impl={args.lstm_impl}]: "
        f"{sps:.2f} steps/s ({wall / args.steps * 1000:.0f} ms/step, "
        f"{audio_sps:.0f} audio-sec/s, MFU {100 * mfu:.1f}%), "
        f"loss {losses[0]:.4f} -> {losses[-1]:.4f}"
    )
    assert losses[-1] < losses[0] and np.isfinite(losses).all()
    if args.skip_stream:
        return 0

    # ---- streaming ----------------------------------------------------------
    from umx_tpu.engine.streaming import StreamingDemixer

    ecfg = EngineConfig(segment=SegmentConfig(segment_secs=args.segment_secs))
    sd = StreamingDemixer(synthetic_params(ecfg.model, seed=0), ecfg)
    sr = ecfg.dsp.sample_rate
    chunk = rng.uniform(-0.5, 0.5, (2, sr)).astype(np.float32)  # 1 s pushes

    lat_idle, lat_boundary = [], []
    total = int(args.stream_secs)
    t_all = time.perf_counter()
    for i in range(total):
        t0 = time.perf_counter()
        out = sd.push(chunk)
        dt = time.perf_counter() - t0
        (lat_boundary if out.shape[-1] else lat_idle).append(dt)
    sd.flush()
    wall = time.perf_counter() - t_all
    med = lambda v: sorted(v)[len(v) // 2] * 1000 if v else float("nan")  # noqa: E731
    compile_push = lat_boundary[0] if lat_boundary else float("nan")
    steady = lat_boundary[1:]
    print(
        f"stream[seg={args.segment_secs:.0f}s, 1s pushes]: "
        f"idle push p50 {med(lat_idle):.1f} ms ({len(lat_idle)}x), "
        f"segment-boundary push p50 {med(steady):.1f} ms ({len(steady)}x; "
        f"first = compile: {compile_push:.1f} s), "
        f"sustained {args.stream_secs / wall:.1f}x realtime"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
