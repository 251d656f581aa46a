"""Command-line demixer, matching the reference CLI contract
(umx.cpp:26-96): ``umx-tpu <model file> <wav file> <out dir>`` writes
``target_0.wav`` … ``target_3.wav`` (bass, drums, other, vocals).

Extends the reference's 3 positional args with a proper flag layer for
the knobs the reference hardcodes (SURVEY §5 config inventory).
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="umx-tpu",
        description="TPU-native Open-Unmix 4-stem music demixer",
    )
    p.add_argument("model_file", help="ggml model file (.bin or .bin.gz)")
    p.add_argument("wav_file", help="input 44.1 kHz WAV (mono or stereo)")
    p.add_argument("out_dir", help="output directory for target_{0..3}.wav")
    p.add_argument("--no-wiener", action="store_true", help="skip the Wiener-EM post-filter")
    p.add_argument("--wiener-iters", type=int, default=1, help="Wiener EM iterations")
    p.add_argument("--no-streaming", action="store_true", help="reset LSTM state per segment")
    p.add_argument(
        "--shifts", type=int, default=1,
        help="Demucs shift-trick passes to average (0 disables; reference supports only 1)",
    )
    p.add_argument("--seed", type=int, default=0, help="PRNG seed for the shift trick")
    p.add_argument("--segment-secs", type=float, default=60.0, help="segment length (s)")
    p.add_argument("--overlap", type=float, default=0.25, help="segment overlap fraction")
    p.add_argument(
        "--matmul-precision",
        choices=("default", "high", "highest"),
        default="default",
        help="network matmul precision: default = single-pass bf16 (the "
        "TPU fast path; oracle deviation 46 dB below signal, PARITY.md), "
        "high/highest = 3/6-pass fp32-class emulation at 3x/6x matmul cost",
    )
    p.add_argument(
        "--dft-precision",
        choices=("auto", "default", "high", "highest"),
        default="auto",
        help="forward-transform matmul precision (auto = single-pass "
        "bf16 on TPU: stft 2.0 -> ~0.8 ms; it feeds the network input "
        "and Wiener phase, bounded end-to-end at 45.3 dB below signal "
        "— PARITY.md dft_default row; high = 3-pass fp32-class)",
    )
    p.add_argument(
        "--idft-precision",
        choices=("auto", "default", "high", "highest"),
        default="auto",
        help="inverse-transform matmul precision (auto = single-pass bf16 "
        "on TPU: iSTFT 13.9 -> 6.9 ms at a -52 dB noise floor, parity "
        "45.8 dB at production shape — PARITY.md idft row)",
    )
    p.add_argument(
        "--mask-dtype",
        choices=("auto", "float32", "bfloat16"),
        default="auto",
        help="storage dtype of the network mask output at the inference "
        "seam (auto = bfloat16 on TPU: halves both Wiener passes' mask "
        "reads; same rounding class as the bf16 matmuls that produce "
        "them — PARITY.md)",
    )
    p.add_argument(
        "--stems-stack-dtype",
        choices=("auto", "float32", "bfloat16"),
        default="auto",
        help="storage dtype of the fused-track stacked weighted chunk "
        "stems feeding overlap-add (auto = bfloat16 on TPU: halves the "
        "track program's largest allocation; OLA still accumulates f32)",
    )
    p.add_argument(
        "--iframes-dtype",
        choices=("auto", "float32", "bfloat16"),
        default="auto",
        help="storage dtype of the post-iDFT frame tensor the "
        "overlap-add streams (auto = bfloat16 on TPU when the inverse "
        "matmuls are already single-pass bf16)",
    )
    p.add_argument(
        "--istft-algo",
        choices=("auto", "dense", "ct2", "ct2_xla"),
        default="auto",
        help="inverse-transform algorithm A/B arm (auto = dense "
        "matmul-DFT, the measured winner; ct2 = fused Cooley-Tukey "
        "Pallas kernel, ct2_xla = einsum CT — both recorded negative "
        "results kept for A/B, PERF.md)",
    )
    p.add_argument(
        "--wiener-impl",
        choices=("auto", "einsum", "pallas"),
        default="auto",
        help="Wiener-EM implementation (auto = fused two-pass Pallas "
        "kernels on TPU, ~6x less HBM traffic; einsum = portable "
        "whole-segment chain, required for --wiener-psd umxcpp)",
    )
    p.add_argument(
        "--wiener-out-dtype",
        choices=("auto", "float32", "bfloat16"),
        default="auto",
        help="storage dtype of the emitted Wiener y planes (auto = "
        "bfloat16 on TPU: halves the apply pass's dominant write "
        "traffic; bounded by the PARITY wiener_bf16 row)",
    )
    p.add_argument(
        "--lstm-impl",
        choices=("auto", "scan", "pallas_merged"),
        default="auto",
        help="BLSTM recurrence implementation (auto = merged Pallas "
        "kernel on TPU — grid rides the recurrence, batch-native "
        "custom_vmap fold; scan = portable lax.scan)",
    )
    p.add_argument(
        "--stream-impl",
        choices=("scan", "groups", "pipelined"),
        default="scan",
        help="streaming track program (scan = fused sequential scan, "
        "the measured winner; groups = split-phase A/B arm: state-free "
        "pre/post vmapped across chunk groups, recurrence-only chain; "
        "pipelined = cross-chunk layer-pipeline A/B arm: 3 layer-stages "
        "of different chunks per merged-kernel call, identical math)",
    )
    p.add_argument(
        "--chunk-batch",
        type=int,
        default=0,
        help="non-streaming fused-track group width (0 = auto: the HBM "
        "planner picks the widest fitting width — the shipped default)",
    )
    p.add_argument(
        "--window-chunks",
        type=int,
        default=0,
        help="windowed-fused width in chunks for tracks beyond one "
        "program's HBM (0 = auto: single program while the planner says "
        "the track fits, windowed beyond; -1 = always one program; >0 "
        "forces that window width)",
    )
    p.add_argument(
        "--input-scaling",
        choices=("openunmix", "umxcpp"),
        default="openunmix",
        help="input normalization convention: upstream openunmix "
        "(x+mean)*scale or the reference C++'s x*scale+mean deviation",
    )
    p.add_argument(
        "--wiener-psd",
        choices=("correct", "umxcpp"),
        default="correct",
        help="source PSD: standard |y|^2 or the reference's (re+im)^2 quirk",
    )
    p.add_argument(
        "--quantized-hbm",
        action="store_true",
        help="keep u8/u16 weights quantized in HBM with dequant fused "
        "into the gemms (less memory/bandwidth; bf16-grade matmuls)",
    )
    p.add_argument(
        "--host-loop",
        action="store_true",
        help="dispatch one XLA call per segment (per-segment progress) "
        "instead of the fused whole-track program",
    )
    p.add_argument(
        "--resample",
        action="store_true",
        help="resample non-44.1 kHz inputs instead of rejecting them",
    )
    p.add_argument(
        "--timings", action="store_true", help="print a per-stage wall-clock table"
    )
    p.add_argument("--quiet", action="store_true")
    return p


def main(argv=None) -> int:
    try:
        return _main(argv)
    except FileNotFoundError as e:
        print(f"umx-tpu: file not found: {e.filename or e}", file=sys.stderr)
        return 1
    except ValueError as e:
        print(f"umx-tpu: {e}", file=sys.stderr)
        return 1


def _main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    def log(*a):
        if not args.quiet:
            print(*a, flush=True)

    from umx_tpu.config import EngineConfig, ModelConfig, SegmentConfig, WienerConfig
    from umx_tpu.engine.separator import Separator
    from umx_tpu.io.audio import load_audio, write_audio

    from umx_tpu.config import DSPConfig

    if args.wiener_psd == "umxcpp" and args.wiener_impl == "pallas":
        print("umx-tpu: --wiener-psd umxcpp requires --wiener-impl einsum "
              "(the Pallas kernels implement the correct-PSD semantics only)",
              file=sys.stderr)
        return 2

    cfg = EngineConfig(
        model=ModelConfig(
            input_scaling=args.input_scaling, lstm_impl=args.lstm_impl
        ),
        dsp=DSPConfig(
            dft_precision=args.dft_precision,
            idft_precision=args.idft_precision,
            iframes_dtype=args.iframes_dtype,
            istft_algo=args.istft_algo,
        ),
        mask_dtype=args.mask_dtype,
        stems_stack_dtype=args.stems_stack_dtype,
        stream_impl=args.stream_impl,
        segment=SegmentConfig(
            segment_secs=args.segment_secs,
            overlap=args.overlap,
            streaming=not args.no_streaming,
            chunk_batch=args.chunk_batch,
            window_chunks=args.window_chunks,
        ),
        wiener=WienerConfig(
            iterations=args.wiener_iters,
            psd=args.wiener_psd,
            impl=args.wiener_impl,
            out_dtype=args.wiener_out_dtype,
        ),
        use_wiener=not args.no_wiener,
        shifts=args.shifts,
        matmul_precision=args.matmul_precision,
    )

    from umx_tpu.utils.profiling import StageTimer

    timer = StageTimer()
    t0 = time.perf_counter()
    with timer.stage("load_audio"):
        audio = load_audio(args.wav_file, cfg.dsp.sample_rate, resample=args.resample)
    log(f"Loaded {args.wav_file}: {audio.shape[1]} samples "
        f"({audio.shape[1] / cfg.dsp.sample_rate:.1f} s)")

    with timer.stage("load_model"):
        sep = Separator.from_ggml(args.model_file, cfg, quantized_hbm=args.quantized_hbm)
    log(f"Loaded model {args.model_file} (hidden_size="
        f"{sep.cfg.model.hidden_size}) in {timer.totals['load_model']:.2f} s")

    progress = None
    if args.host_loop and not args.quiet:
        progress = lambda f: log(f"  demix {f * 100:.0f}%")  # noqa: E731
    with timer.stage("demix"):
        stems = sep.demix_track(
            audio, seed=args.seed, progress=progress, fused=not args.host_loop
        )
    dt = timer.totals["demix"]
    secs = audio.shape[1] / cfg.dsp.sample_rate
    log(f"Demixed in {dt:.2f} s ({secs / dt:.1f}x realtime)")

    os.makedirs(args.out_dir, exist_ok=True)
    with timer.stage("write_stems"):
        for i in range(stems.shape[0]):
            path = os.path.join(args.out_dir, f"target_{i}.wav")
            write_audio(path, stems[i], cfg.dsp.sample_rate)
            log(f"Wrote {path}")
    log(f"Total {time.perf_counter() - t0:.2f} s")
    if args.timings:
        print(timer.report())
    return 0


if __name__ == "__main__":
    sys.exit(main())
