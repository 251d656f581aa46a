#!/usr/bin/env python
"""Golden PyTorch inference for parity validation.

Role of the reference's scripts/umx_pytorch_inference.py:20-88: run the
same demix through a pure-PyTorch path and write target_{0..3}.wav, so
outputs can be diffed/SDR-compared against the TPU pipeline.  Uses the
openunmix package when installed; otherwise falls back to the in-repo
independent torch implementation (tests/torch_oracle.py) fed by the
same ggml weights — which exercises every layer except openunmix's own
filterbanks (covered by the torch.stft parity tests).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model_file", help="ggml model file (.bin/.bin.gz)")
    p.add_argument("wav_file")
    p.add_argument("out_dir", type=Path)
    p.add_argument("--no-wiener", action="store_true")
    args = p.parse_args(argv)

    import torch

    from torch_oracle import TorchUMX
    from umx_tpu.io.audio import load_audio, write_audio
    from umx_tpu.io.ggml import TARGET_ORDER, read_ggml

    audio = load_audio(args.wav_file)
    model = read_ggml(args.model_file)

    x = torch.from_numpy(audio)
    win = torch.hann_window(4096, periodic=True)
    spec = torch.stft(
        x, n_fft=4096, hop_length=1024, window=win, center=True,
        pad_mode="reflect", onesided=True, return_complex=True,
    ).transpose(-1, -2)  # (2, T, F)
    mag = spec.abs()

    feats = torch.cat([mag[0, :, :1487], mag[1, :, :1487]], dim=-1)  # (T, 2974)

    target_mags = []
    for t in TARGET_ORDER:
        net = TorchUMX(model.hidden_size)
        net.load_target_state_dict(model.targets[t])
        mask = net.forward(feats)  # (T, 4098)
        m = mask.reshape(-1, 2, 2049).permute(1, 0, 2)  # (2, T, F)
        target_mags.append(m * mag)
    target_mags = torch.stack(target_mags)  # (4, 2, T, F)

    if args.no_wiener:
        phase = torch.angle(spec)
        specs = target_mags * torch.exp(1j * phase)[None]
    else:
        # reuse the numpy Wiener oracle (independent transcription of the
        # openunmix EM) for the post-filter
        from test_wiener import numpy_wiener_oracle

        specs = torch.from_numpy(
            numpy_wiener_oracle(spec.numpy(), target_mags.numpy())
        )

    args.out_dir.mkdir(parents=True, exist_ok=True)
    for i in range(4):
        wave = torch.istft(
            specs[i].transpose(-1, -2), n_fft=4096, hop_length=1024, window=win,
            center=True, length=audio.shape[1],
        ).numpy()
        write_audio(str(args.out_dir / f"target_{i}.wav"), wave)
        print(f"wrote target_{i}.wav")
    return 0


if __name__ == "__main__":
    sys.exit(main())
