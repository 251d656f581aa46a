#!/usr/bin/env python
"""Full-scale golden parity: the COMPLETE pipeline at UMX-L production
shape (hidden=1024, 60 s segment, T=2584 frames, all 4 targets) against
the independent torch oracle chain:

    torch.stft -> TorchUMX mask nets (tests/torch_oracle.py)
    -> numpy Wiener-EM oracle (tests/test_wiener.py) -> torch.istft

run for EVERY shipped flag combination, so each user-facing config has a
production-shape implementation-error bound (VERDICT r2 #4):

    fp32      default matmul precision (the shipped fast path)
    high      matmul_precision="high" (3-pass fp32-class matmuls)
    qhbm      quantized-HBM resident weights (u8/u16 planes)
    pallas    merged Pallas BLSTM recurrence kernel (TPU only)
    ct2_xla   Cooley-Tukey iSTFT, XLA einsum stages
    ct2       Cooley-Tukey iSTFT, fused Pallas kernels (TPU only)
    em2       wiener.iterations=2 (the --wiener-iters CLI path)
    nowiener  use_wiener=False (mask * mixture-phase path)
    quirk     wiener.psd="umxcpp" (reference PSD quirk, einsum impl)
    stream2   TWO sequential segments with the LSTM state carried across
              the boundary (streaming semantics, umx.cpp:167-171) — the
              oracle carries torch nn.LSTM state the same way

Real UMX-L weights are unreachable in this environment (the reference
ggml artifact is a git-LFS pointer, LFS/torchhub need network, no cached
checkpoints exist — re-verified round 2), so this is the strongest
available evidence for the 0.1 dB SDR-parity north star: synthetic but
realistically-scaled weights at the exact production shapes, through
every real code path.  For the quantized row the oracle consumes the
SAME dequantized weights, isolating OUR implementation error from the
(reference-accepted, ±0.01 dB) quantization error.

Writes one JSON line per variant and a markdown table for PARITY.md.

Usage: [UMX_TPU_PLATFORM=cpu] python scripts/parity-fullscale.py
       [--seg-secs 60] [--variants fp32,high,qhbm,...]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

CPU_VARIANTS = "fp32,high,qhbm,ct2_xla,em2,nowiener,quirk,stream2"


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--seg-secs", type=float, default=60.0)
    p.add_argument("--variants", default=CPU_VARIANTS)
    p.add_argument("--hidden", type=int, default=1024)
    p.add_argument("--out", default=None, help="write JSON results here")
    args = p.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/umx_tpu_xla_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np
    import torch

    from test_wiener import numpy_wiener_oracle
    from torch_oracle import oracle_masks, oracle_masks_stream

    from umx_tpu.config import EngineConfig, ModelConfig, SegmentConfig
    from umx_tpu.engine.separator import crop_stack, segment_forward
    from umx_tpu.io.ggml import read_ggml_bytes, write_ggml_bytes
    from umx_tpu.models.umx import (
        init_lstm_state,
        params_from_ggml,
        quantized_params_from_ggml,
        synthetic_state_dicts,
    )

    cfg = EngineConfig(
        model=ModelConfig(hidden_size=args.hidden),
        segment=SegmentConfig(segment_secs=args.seg_secs),
    )
    dcfg, mcfg = cfg.dsp, cfg.model
    n = cfg.segment.segment_samples(dcfg.sample_rate)
    print(
        f"# parity-fullscale: backend={jax.default_backend()} hidden={args.hidden} "
        f"seg={args.seg_secs}s T={dcfg.n_frames(n)}",
        file=sys.stderr,
    )

    # ---- realistic input: the real glockenspiel recording tiled to the
    # segment length, plus broadband noise so every bin carries energy
    from umx_tpu.io.audio import load_audio

    gspi = load_audio(os.path.join("tests", "data", "gspi_stereo.wav"))
    reps = -(-n // gspi.shape[1])
    audio = np.tile(gspi, (1, reps))[:, :n]
    rng = np.random.default_rng(0)
    audio = (audio + 0.01 * rng.standard_normal(audio.shape)).astype(np.float32)
    audio *= 0.5 / np.abs(audio).max()

    # ---- weights through the REAL artifact chain: state dicts -> ggml
    # bytes (quantized u8/u16) -> parsed back.  The oracle uses the
    # dequantized tensors; our engine uses either the same dequantized
    # floats or the raw quantized planes (qhbm row).
    sds = synthetic_state_dicts(mcfg, seed=7)
    blob = write_ggml_bytes(mcfg.hidden_size, sds)
    model_deq = read_ggml_bytes(blob, keep_quantized=True)
    deq_sds = model_deq.targets

    win = torch.hann_window(dcfg.n_fft, periodic=True)

    def torch_spec(aud: np.ndarray) -> np.ndarray:
        return (
            torch.stft(
                torch.from_numpy(aud),
                n_fft=dcfg.n_fft,
                hop_length=dcfg.hop,
                window=win,
                center=True,
                pad_mode="reflect",
                normalized=False,
                onesided=True,
                return_complex=True,
            )
            .numpy()
            .swapaxes(-1, -2)
        )  # (2, T, F)

    def torch_istft_all(y: np.ndarray, length: int) -> np.ndarray:
        return np.stack(
            [
                torch.istft(
                    torch.from_numpy(y[s].swapaxes(-1, -2).copy()),
                    n_fft=dcfg.n_fft,
                    hop_length=dcfg.hop,
                    window=win,
                    center=True,
                    length=length,
                ).numpy()
                for s in range(y.shape[0])
            ]
        )  # (S, 2, length)

    def masks_to_target_mags(masks: np.ndarray, mag: np.ndarray) -> np.ndarray:
        t_count, f_bins = mag.shape[1], mag.shape[2]
        m = masks.reshape(4, t_count, 2, f_bins).transpose(0, 2, 1, 3)
        return (m * mag[None]).astype(np.float32)

    def oracle_waves(
        spec: np.ndarray,
        target_mags: np.ndarray,
        length: int,
        *,
        use_wiener: bool = True,
        iterations: int = 1,
        psd: str = "correct",
    ) -> np.ndarray:
        if use_wiener:
            y = numpy_wiener_oracle(
                spec.astype(np.complex64),
                target_mags,
                iterations,
                cfg.wiener.eps,
                cfg.wiener.scale_factor,
                psd=psd,
            )
        else:
            # mask * mixture-phase path (reference inference.cpp:168-183
            # when wiener is compiled out)
            phase = np.exp(1j * np.angle(spec))[None]
            y = (target_mags * phase).astype(np.complex64)
        return torch_istft_all(y, length)

    # ---- shared whole-segment oracle pieces -------------------------------
    spec_t = torch_spec(audio)
    mag = np.abs(spec_t)
    x_in = np.asarray(crop_stack(jnp.asarray(mag), mcfg.nb_bins_cropped))
    print("# oracle: mask nets...", file=sys.stderr)
    masks = oracle_masks(deq_sds, x_in, mcfg.hidden_size)  # (4, T, 4098)
    target_mags = masks_to_target_mags(masks, mag)

    _oracle_cache: dict[tuple, np.ndarray] = {}

    def oracle_for(use_wiener=True, iterations=1, psd="correct") -> np.ndarray:
        key = (use_wiener, iterations, psd)
        if key not in _oracle_cache:
            print(f"# oracle: wiener/istft {key}...", file=sys.stderr)
            _oracle_cache[key] = oracle_waves(
                spec_t, target_mags, n,
                use_wiener=use_wiener, iterations=iterations, psd=psd,
            )
        return _oracle_cache[key]

    # ---- our engine, per variant ------------------------------------------
    audio_j = jnp.asarray(audio)
    fp32_params = params_from_ggml(model_deq, mcfg)
    results = []
    for variant in args.variants.split(","):
        vcfg = cfg
        params = fp32_params
        okey = dict(use_wiener=True, iterations=1, psd="correct")
        if variant == "fp32":
            pass
        elif variant == "high":
            vcfg = cfg.replace(matmul_precision="high")
        elif variant == "qhbm":
            params = quantized_params_from_ggml(model_deq, mcfg)
        elif variant == "pallas":
            # merged Pallas BLSTM recurrence kernel (TPU only)
            vcfg = cfg.replace(
                model=dataclasses.replace(mcfg, lstm_impl="pallas_merged")
            )
        elif variant in ("ct2", "ct2_xla", "ct2_interpret"):
            # Cooley-Tukey iSTFT ("ct2" = fused Pallas kernels, TPU only)
            vcfg = cfg.replace(dsp=dataclasses.replace(dcfg, istft_algo=variant))
        elif variant == "idft_default":
            # single-pass bf16 inverse transform (the TPU auto default)
            vcfg = cfg.replace(
                dsp=dataclasses.replace(dcfg, idft_precision="default")
            )
        elif variant == "idft_high":
            vcfg = cfg.replace(
                dsp=dataclasses.replace(dcfg, idft_precision="high")
            )
        elif variant == "wiener_bf16":
            vcfg = cfg.replace(
                wiener=dataclasses.replace(cfg.wiener, out_dtype="bfloat16")
            )
        elif variant == "wiener_f32":
            vcfg = cfg.replace(
                wiener=dataclasses.replace(cfg.wiener, out_dtype="float32")
            )
        elif variant == "dft_default":
            # single-pass bf16 FORWARD transform (the TPU auto default
            # since round 3: feeds the network input magnitudes and the
            # Wiener phase — bounded end-to-end by this row)
            vcfg = cfg.replace(
                dsp=dataclasses.replace(dcfg, dft_precision="default")
            )
        elif variant == "dft_high":
            # the precise A/B arm for the forward transform
            vcfg = cfg.replace(
                dsp=dataclasses.replace(dcfg, dft_precision="high")
            )
        elif variant == "em2":
            vcfg = cfg.replace(
                wiener=dataclasses.replace(cfg.wiener, iterations=2)
            )
            okey = dict(use_wiener=True, iterations=2, psd="correct")
        elif variant == "nowiener":
            vcfg = cfg.replace(use_wiener=False)
            okey = dict(use_wiener=False)
        elif variant == "quirk":
            vcfg = cfg.replace(
                wiener=dataclasses.replace(cfg.wiener, psd="umxcpp")
            )
            okey = dict(use_wiener=True, iterations=1, psd="umxcpp")
        elif variant == "stream2":
            row = _stream2_row(
                args, cfg, deq_sds, audio, audio_j,
                torch_spec, masks_to_target_mags, oracle_waves,
                oracle_masks_stream, crop_stack, segment_forward,
                init_lstm_state, params_from_ggml, model_deq,
                jax, jnp, np,
            )
            results.append(row)
            print(json.dumps(row))
            continue
        else:
            raise SystemExit(f"unknown variant {variant}")

        waves_oracle = oracle_for(**okey)
        print(f"# ours[{variant}]: segment_forward...", file=sys.stderr)
        state = init_lstm_state(mcfg)
        waves, _ = segment_forward(params, audio_j, state, vcfg, n)
        waves = np.asarray(waves)
        row = _err_row(variant, waves, waves_oracle, args, jax, np)
        results.append(row)
        print(json.dumps(row))

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)

    print("\n| variant | waveform err (dB below signal) | max rel err | per-stem err dB |")
    print("|---|---|---|---|")
    for r in results:
        print(
            f"| {r['variant']} | {r['waveform_err_db']} | "
            f"{r['waveform_max_rel_err']:.2e} | {r['per_stem_err_db']} |"
        )
    return 0


def _err_row(variant, waves, waves_oracle, args, jax, np):
    sig = float(np.sum(waves_oracle**2))
    err = float(np.sum((waves - waves_oracle) ** 2))
    err_db = 10.0 * np.log10(sig / max(err, 1e-30))
    peak = float(np.abs(waves_oracle).max())
    max_abs = float(np.abs(waves - waves_oracle).max())
    per_stem = []
    for s in range(waves.shape[0]):
        ss = float(np.sum(waves_oracle[s] ** 2))
        se = float(np.sum((waves[s] - waves_oracle[s]) ** 2))
        per_stem.append(round(float(10.0 * np.log10(ss / max(se, 1e-30))), 1))
    return {
        "variant": variant,
        "seg_secs": args.seg_secs,
        "hidden": args.hidden,
        "backend": jax.default_backend(),
        "waveform_err_db": round(err_db, 1),
        "waveform_max_abs_err": max_abs,
        "waveform_max_rel_err": max_abs / peak,
        "per_stem_err_db": per_stem,
    }


def _stream2_row(
    args, cfg, deq_sds, audio, audio_j,
    torch_spec, masks_to_target_mags, oracle_waves,
    oracle_masks_stream, crop_stack, segment_forward,
    init_lstm_state, params_from_ggml, model_deq,
    jax, jnp, np,
):
    """Two sequential half-length segments with LSTM state carried across
    the boundary — our streaming path vs the torch oracle carrying
    nn.LSTM (h, c) the same way (reference umx.cpp:167-171)."""
    mcfg = cfg.model
    n = audio.shape[1]
    half = n // 2
    halves = [audio[:, :half], audio[:, half : 2 * half]]

    specs = [torch_spec(h) for h in halves]
    mags = [np.abs(s) for s in specs]
    xs = [
        np.asarray(crop_stack(jnp.asarray(m), mcfg.nb_bins_cropped))
        for m in mags
    ]
    print("# oracle[stream2]: mask nets with carried state...", file=sys.stderr)
    masks_seq = oracle_masks_stream(deq_sds, xs, mcfg.hidden_size)
    waves_oracle = np.concatenate(
        [
            oracle_waves(specs[i], masks_to_target_mags(masks_seq[i], mags[i]), half)
            for i in range(2)
        ],
        axis=-1,
    )

    print("# ours[stream2]: segment_forward x2 with carried state...", file=sys.stderr)
    params = params_from_ggml(model_deq, mcfg)
    state = init_lstm_state(mcfg)
    outs = []
    for i in range(2):
        w, state = segment_forward(
            params, jnp.asarray(halves[i]), state, cfg, half
        )
        outs.append(np.asarray(w))
    waves = np.concatenate(outs, axis=-1)
    return _err_row("stream2", waves, waves_oracle, args, jax, np)


if __name__ == "__main__":
    sys.exit(main())
