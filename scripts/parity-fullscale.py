#!/usr/bin/env python
"""Full-scale golden parity: the COMPLETE pipeline at UMX-L production
shape (hidden=1024, 60 s segment, T=2584 frames, all 4 targets) against
the independent torch oracle chain:

    torch.stft -> TorchUMX mask nets (tests/torch_oracle.py)
    -> numpy Wiener-EM oracle (tests/test_wiener.py) -> torch.istft

run for each shipped numerics path (fp32, bfloat16 compute, quantized-HBM
weights).  Real UMX-L weights are unreachable in this environment (the
reference ggml artifact is a git-LFS pointer, LFS/torchhub need network,
no cached checkpoints exist — re-verified round 2), so this is the
strongest available evidence for the 0.1 dB SDR-parity north star:
synthetic-but-realistically-scaled weights at the exact production
shapes, through every real code path.  For the quantized row, the oracle
consumes the SAME dequantized weights, isolating OUR implementation
error from the (reference-accepted, ±0.01 dB) quantization error.

Writes one JSON line per variant and a markdown table for PARITY.md.

Usage: [UMX_TPU_PLATFORM=cpu] python scripts/parity-fullscale.py
       [--seg-secs 60] [--variants fp32,bf16,qhbm]
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


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--seg-secs", type=float, default=60.0)
    p.add_argument("--variants", default="fp32,bf16,qhbm")
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
    from torch_oracle import oracle_masks

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
    # floats (fp32/bf16 rows) or the raw quantized planes (qhbm row).
    sds = synthetic_state_dicts(mcfg, seed=7)
    blob = write_ggml_bytes(mcfg.hidden_size, sds)
    model_deq = read_ggml_bytes(blob, keep_quantized=True)
    # torch-layout dicts for the oracle == dequantized ggml tensors
    deq_sds = model_deq.targets

    # ---- oracle chain (float64 wiener, torch fp32 elsewhere) -------------
    win = torch.hann_window(dcfg.n_fft, periodic=True)
    spec_t = torch.stft(
        torch.from_numpy(audio),
        n_fft=dcfg.n_fft,
        hop_length=dcfg.hop,
        window=win,
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    ).numpy().swapaxes(-1, -2)  # (2, T, F)
    mag = np.abs(spec_t)
    x_in = np.asarray(crop_stack(jnp.asarray(mag), mcfg.nb_bins_cropped))
    print("# oracle: mask nets...", file=sys.stderr)
    masks = oracle_masks(deq_sds, x_in, mcfg.hidden_size)  # (4, T, 4098)
    t_count, f_bins = mag.shape[1], mag.shape[2]
    m = masks.reshape(4, t_count, 2, f_bins).transpose(0, 2, 1, 3)
    target_mags = (m * mag[None]).astype(np.float32)
    print("# oracle: wiener-EM (float64)...", file=sys.stderr)
    y_oracle = numpy_wiener_oracle(
        spec_t.astype(np.complex64), target_mags,
        cfg.wiener.iterations, cfg.wiener.eps, cfg.wiener.scale_factor,
    )
    print("# oracle: istft...", file=sys.stderr)
    waves_oracle = np.stack(
        [
            torch.istft(
                torch.from_numpy(y_oracle[s].swapaxes(-1, -2).copy()),
                n_fft=dcfg.n_fft,
                hop_length=dcfg.hop,
                window=win,
                center=True,
                length=n,
            ).numpy()
            for s in range(4)
        ]
    )  # (4, 2, n)

    # ---- our engine, per variant ------------------------------------------
    audio_j = jnp.asarray(audio)
    results = []
    rows = []
    for variant in args.variants.split(","):
        if variant == "fp32":
            vcfg = cfg
            params = params_from_ggml(model_deq, mcfg)
        elif variant == "bf16":
            vcfg = cfg.replace(compute_dtype="bfloat16")
            params = params_from_ggml(model_deq, mcfg)
        elif variant == "qhbm":
            vcfg = cfg
            params = quantized_params_from_ggml(model_deq, mcfg)
        elif variant == "pallas":
            # the merged Pallas BLSTM recurrence kernel (TPU only)
            vcfg = cfg.replace(
                model=dataclasses.replace(mcfg, lstm_impl="pallas_merged")
            )
            params = params_from_ggml(model_deq, mcfg)
        else:
            raise SystemExit(f"unknown variant {variant}")
        print(f"# ours[{variant}]: segment_forward...", file=sys.stderr)
        state = init_lstm_state(mcfg)
        waves, _ = segment_forward(params, audio_j, state, vcfg, n)
        waves = np.asarray(waves)

        sig = float(np.sum(waves_oracle**2))
        err = float(np.sum((waves - waves_oracle) ** 2))
        err_db = 10.0 * np.log10(sig / max(err, 1e-30))
        peak = float(np.abs(waves_oracle).max())
        max_abs = float(np.abs(waves - waves_oracle).max())
        # per-stem error dB (bounds the per-stem SDR impact)
        per_stem = []
        for s in range(4):
            ss = float(np.sum(waves_oracle[s] ** 2))
            se = float(np.sum((waves[s] - waves_oracle[s]) ** 2))
            per_stem.append(round(float(10.0 * np.log10(ss / max(se, 1e-30))), 1))
        row = {
            "variant": variant,
            "seg_secs": args.seg_secs,
            "hidden": args.hidden,
            "backend": jax.default_backend(),
            "waveform_err_db": round(err_db, 1),
            "waveform_max_abs_err": max_abs,
            "waveform_max_rel_err": max_abs / peak,
            "per_stem_err_db": per_stem,
        }
        results.append(row)
        rows.append(row)
        print(json.dumps(row))

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)

    print("\n| variant | waveform err (dB below signal) | max rel err | per-stem err dB |")
    print("|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['variant']} | {r['waveform_err_db']} | "
            f"{r['waveform_max_rel_err']:.2e} | {r['per_stem_err_db']} |"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
