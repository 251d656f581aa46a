#!/usr/bin/env python
"""STFT parity probe: print spectrogram values from torch.stft and from
the umx-tpu transform side by side on a synthetic square wave.

Role of the reference's scripts/compare-torch-stft.py:1-35 (its output
was eyeball-diffed against the C++ gtest prints); here the diff is
computed and asserted automatically.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    import torch

    from umx_tpu.config import DSPConfig
    from umx_tpu.ops import stft as stft_ops

    cfg = DSPConfig()
    n = 4096 * 10
    t = np.arange(n) / cfg.sample_rate
    x = np.sign(np.sin(2 * np.pi * 441.0 * t)).astype(np.float32)[None]

    win = torch.hann_window(cfg.n_fft, periodic=True)
    ref = (
        torch.stft(
            torch.from_numpy(x), n_fft=cfg.n_fft, hop_length=cfg.hop, window=win,
            center=True, pad_mode="reflect", onesided=True, return_complex=True,
        )
        .numpy()
        .swapaxes(-1, -2)
    )
    ours = np.asarray(stft_ops.stft(x, cfg))

    frame = ref.shape[1] // 2
    print(f"center frame {frame}, bins 0..9 (|X|):")
    print(f"{'bin':>4} {'torch':>14} {'umx-tpu':>14} {'absdiff':>12}")
    for b in range(10):
        tv, ov = abs(ref[0, frame, b]), abs(ours[0, frame, b])
        print(f"{b:>4} {tv:>14.6f} {ov:>14.6f} {abs(tv - ov):>12.3e}")

    scale = np.abs(ref).max()
    err = np.abs(ours - ref).max() / scale
    print(f"\nmax relative error vs torch.stft: {err:.3e}")
    assert err < 2e-4, "STFT parity broken"
    print("parity OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
