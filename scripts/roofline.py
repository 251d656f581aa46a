#!/usr/bin/env python
"""Per-stage roofline quantification on the real TPU (VERDICT r1 #4).

For every pipeline stage at UMX-L 60 s-segment scale this measures wall
time (scalar-fetch barrier; block_until_ready is not a barrier on axon)
and reports, from first-principles byte/FLOP counts:

  * achieved HBM GB/s vs the v5e peak (819 GB/s),
  * achieved matmul TFLOP/s vs the v5e bf16 peak (197 TFLOP/s), with
    MFU normalized by the precision pass count (HIGH = 3 bf16 passes,
    HIGHEST = 6),
  * each stage's roofline-limited minimum time and the implied
    theoretical xRT ceiling for the full pipeline.

Usage: python scripts/roofline.py [--stages stft,istft,wiener,network]
                                  [--seg-secs 60] [--reps 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HBM_PEAK_GBS = 819.0  # TPU v5e
BF16_PEAK_TFLOPS = 197.0  # TPU v5e MXU
PASSES = {"highest": 6, "high": 3, "default": 1}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--stages", default="stft,istft,wiener,network,pipeline")
    p.add_argument("--seg-secs", type=float, default=60.0)
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--json", action="store_true", help="emit one JSON line per row")
    args = p.parse_args()

    import jax

    cache_dir = os.environ.get("UMX_TPU_CACHE", "/tmp/umx_tpu_xla_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from umx_tpu.config import EngineConfig, SegmentConfig
    from umx_tpu.models.umx import init_lstm_state, synthetic_params, umx_forward
    from umx_tpu.ops import fft as mxu_fft
    from umx_tpu.ops import stft as stft_ops
    from umx_tpu.ops.wiener import wiener_filter, wiener_filter_planes

    cfg = EngineConfig(segment=SegmentConfig(segment_secs=args.seg_secs))
    dcfg, mcfg = cfg.dsp, cfg.model
    sr, n_fft, hop = dcfg.sample_rate, dcfg.n_fft, dcfg.hop
    n = cfg.segment.segment_samples(sr)
    T = dcfg.n_frames(n)
    F = dcfg.n_bins
    S = mcfg.n_targets
    prec = stft_ops._resolve_dft_precision(dcfg)
    passes = PASSES[prec]

    print(
        f"# roofline: backend={jax.default_backend()} seg={args.seg_secs}s "
        f"T={T} F={F} dft_precision={prec} ({passes}-pass)",
        file=sys.stderr,
    )

    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.uniform(-0.5, 0.5, (2, n)).astype(np.float32))
    params = synthetic_params(mcfg, seed=0)
    state = init_lstm_state(mcfg)

    def drain(x):
        leaves = jax.tree.leaves(x)
        return float(jnp.sum(leaves[0]))

    R_INNER = int(os.environ.get("UMX_ROOFLINE_INNER", "6"))

    def timeit(stage, *a):
        """Median wall time of one stage application, measured with
        R_INNER applications INSIDE one jitted program (array inputs
        perturbed per rep to defeat CSE) — the tunneled backend has a
        ~3 ms per-dispatch floor that would otherwise swamp 5-20 ms
        stages."""

        def many(*a):
            acc = None
            for i in range(R_INNER):
                perturbed = tuple(
                    x * (1.0 + 1e-7 * (i + 1))
                    if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.floating)
                    else x
                    for x in a
                )
                out = stage(*perturbed)
                first = jax.tree.leaves(out)[0]
                s = jnp.sum(first)
                acc = s if acc is None else acc + s
            return acc

        fn = jax.jit(many)
        out = fn(*a)
        drain(out)  # compile + first run
        for _ in range(2):
            drain(fn(*a))
        walls = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out = fn(*a)
            drain(out)
            walls.append((time.perf_counter() - t0) / args.reps)
        return sorted(walls)[1] / R_INNER

    rows = []

    def report(name, ms, gflop, gbytes, note=""):
        tflops = gflop / ms if ms > 0 else 0.0  # GFLOP/ms == TFLOP/s
        gbs = gbytes / ms * 1000.0 if ms > 0 else 0.0
        # MFU normalized by precision passes (a 3-pass fp32 matmul does 3x
        # the bf16-peak work per useful FLOP)
        mfu = tflops * passes / BF16_PEAK_TFLOPS * 100.0
        bwu = gbs / HBM_PEAK_GBS * 100.0
        floor_ms = max(gflop * passes / BF16_PEAK_TFLOPS, gbytes / HBM_PEAK_GBS * 1000.0)
        rows.append(
            dict(stage=name, ms=round(ms, 2), gflop=round(gflop, 1),
                 gbytes=round(gbytes, 2), tflops=round(tflops, 1),
                 mfu_pct=round(mfu, 1), gbs=round(gbs, 0), bw_pct=round(bwu, 1),
                 roofline_floor_ms=round(floor_ms, 2), note=note)
        )

    want = set(args.stages.split(","))

    # ---- STFT --------------------------------------------------------------
    if "stft" in want:
        import dataclasses

        frames_macs_dense = 2 * 2 * T * n_fft * F  # cos+sin, C=2 channels
        n1, n2 = 128, 32
        c2 = n2 // 2 + 1
        macs_ct = 2 * (2 * T * n2 * n1 * n1 + 2 * T * n1 * n2 * c2 * 2)
        # bytes: read audio-frames once (framing reuses), write spec planes
        gb_io = (2 * T * n_fft * 4 + 2 * 2 * T * F * 4) / 1e9
        for algo, macs in (("dense", frames_macs_dense), ("ct", macs_ct)):
            c = dataclasses.replace(dcfg, fft_impl="matmul", dft_algo=algo)
            fn = jax.jit(lambda a, c=c: stft_ops.stft_planes(a, c))
            ms = timeit(fn, audio) * 1000
            report(f"stft[{algo}]", ms, 2 * macs / 1e9, gb_io)

    # ---- iSTFT -------------------------------------------------------------
    if "istft" in want:
        import dataclasses

        sre = jnp.asarray(rng.standard_normal((S, 2, T, F)).astype(np.float32))
        sim = jnp.asarray(rng.standard_normal((S, 2, T, F)).astype(np.float32))
        macs_dense = 2 * S * 2 * T * n_fft * F
        n1, n2 = 128, 32
        c2 = n2 // 2 + 1
        macs_ct = S * 2 * (4 * T * n1 * c2 * n2 + 2 * T * n2 * n1 * n1)
        # bytes: read spec planes, write frames, OLA read+write, wss divide
        gb_io = (
            2 * S * 2 * T * F * 4      # spec planes in
            + 2 * S * 2 * T * n_fft * 4  # frames write + OLA read
            + 3 * S * 2 * (n + 2 * dcfg.pad) * 4  # OLA out rw + final write
        ) / 1e9
        # ct2 (ops/istft_ct.py): stage1 K=2C stacked dot + 2 stage2 K=n1 dots
        c_rows = (n_fft // 2) // n1 + 1
        macs_ct2 = S * 2 * T * (2 * c_rows * n1 * n2 + 2 * n1 * n1 * n2)
        for algo, macs in (
            ("dense", macs_dense),
            ("dense@default", macs_dense),
            ("dense@highest", macs_dense),
            ("ct", macs_ct),
            ("ct2_xla", macs_ct2),
            ("ct2", macs_ct2),
        ):
            if algo.startswith("ct2"):
                c = dataclasses.replace(dcfg, fft_impl="matmul", istft_algo=algo)
            elif "@" in algo:
                prec = algo.split("@")[1]
                c = dataclasses.replace(
                    dcfg, fft_impl="matmul", istft_algo="dense", idft_precision=prec
                )
            else:
                c = dataclasses.replace(
                    dcfg, fft_impl="matmul", dft_algo=algo, istft_algo="dense",
                    idft_precision="high",
                )
            fn = jax.jit(
                lambda re, im, c=c: stft_ops.istft_planes(re, im, n, c)
            )
            try:
                ms = timeit(fn, sre, sim) * 1000
            except Exception as exc:  # noqa: BLE001
                report(f"istft[{algo}]", 0.0, 0.0, 0.0, note=f"FAILED {type(exc).__name__}")
                continue
            report(f"istft[{algo}]", ms, 2 * macs / 1e9, gb_io)

    # ---- Wiener ------------------------------------------------------------
    if "wiener" in want:
        import dataclasses

        xre = jnp.asarray(rng.standard_normal((2, T, F)).astype(np.float32))
        xim = jnp.asarray(rng.standard_normal((2, T, F)).astype(np.float32))
        mags = jnp.asarray(rng.uniform(0, 1, (S, 2, T, F)).astype(np.float32))
        # fused-kernel minimum traffic: reduce reads mags+x, apply reads
        # mags+x and writes 2 y planes
        gb_min = (2 * (S * 2 + 2) * T * F * 4 + 2 * S * 2 * T * F * 4) / 1e9
        # elementwise VPU flops are negligible; report 0 GFLOP
        for impl in ("einsum", "pallas"):
            c = dataclasses.replace(cfg.wiener, impl=impl)
            fn = jax.jit(
                lambda a, b, m, c=c: wiener_filter_planes(a, b, m, c)
            )
            ms = timeit(fn, xre, xim, mags) * 1000
            report(f"wiener[{impl}]", ms, 0.0, gb_min, note="min-traffic bytes")

    # ---- network -----------------------------------------------------------
    if "network" in want:
        x = jnp.asarray(rng.uniform(0, 1, (T, mcfg.n_features)).astype(np.float32))
        fn = jax.jit(
            lambda p, xx, st: umx_forward(p, xx, st, mcfg, "float32")
        )
        ms = timeit(fn, params, x, state) * 1000
        # gemm flops: fc1 + 3 BLSTM layers (ih+hh) + fc2 + fc3, x4 targets
        H, G = mcfg.hidden_size, mcfg.lstm_hidden
        macs = S * T * (
            mcfg.n_features * H            # fc1
            + 3 * 2 * (H * 4 * G + G * 4 * G)  # 3 bidir layers ih+hh
            + 2 * H * H                    # fc2 (skip concat 2H -> H)
            + H * mcfg.n_outputs           # fc3
        )
        gb = (S * T * (mcfg.n_features + mcfg.n_outputs) * 4) / 1e9
        report("network", ms, 2 * macs / 1e9, gb,
               note=f"{ms / (3 * T) * 1000:.2f} us/LSTM-step")

    # ---- full fused segment ------------------------------------------------
    if "pipeline" in want:
        from umx_tpu.engine.separator import segment_forward

        # params must be an ARGUMENT (closed-over arrays become inlined
        # constants -> remote-compile request size limit)
        fn = lambda p, a, st: segment_forward(p, a, st, cfg, n)  # noqa: E731
        ms = timeit(fn, params, audio, state) * 1000
        report("segment_pipeline", ms, 0.0, 0.0,
               note=f"xRT={args.seg_secs / (ms / 1000):.0f}")

    # ---- print -------------------------------------------------------------
    hdr = ("stage", "ms", "GFLOP", "GB", "TFLOP/s", "MFU%", "GB/s", "BW%", "floor_ms", "note")
    widths = [18, 8, 8, 7, 9, 6, 7, 6, 9, 24]
    print("| " + " | ".join(h.ljust(w) for h, w in zip(hdr, widths)) + " |")
    print("|" + "|".join("-" * (w + 2) for w in widths) + "|")
    for r in rows:
        vals = [r["stage"], r["ms"], r["gflop"], r["gbytes"], r["tflops"],
                r["mfu_pct"], r["gbs"], r["bw_pct"], r["roofline_floor_ms"], r["note"]]
        print("| " + " | ".join(str(v).ljust(w) for v, w in zip(vals, widths)) + " |")
    if args.json:
        for r in rows:
            print(json.dumps(r))
    return 0


if __name__ == "__main__":
    sys.exit(main())
