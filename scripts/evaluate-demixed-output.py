#!/usr/bin/env python
"""BSS-eval a demixed output directory against reference stems.

Functional equivalent of the reference's evaluator
(scripts/evaluate-demixed-output.py:19-52, museval-based).  Expects:

* estimates: <est_dir>/target_{0..3}.wav  (bass, drums, other, vocals)
* references: either a MUSDB18-HQ track directory containing
  bass.wav/drums.wav/other.wav/vocals.wav, or 4 explicit paths.

Prints per-stem median SDR/ISR/SIR/SAR over 1 s windows.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TARGETS = ("bass", "drums", "other", "vocals")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("est_dir", type=Path, help="directory with target_{0..3}.wav")
    p.add_argument("track_dir", type=Path, help="MUSDB track dir with <stem>.wav files")
    p.add_argument("--win", type=float, default=1.0, help="window seconds")
    p.add_argument("--flen", type=int, default=512, help="projection filter length")
    p.add_argument("--json", type=Path, default=None, help="also write results as JSON")
    p.add_argument("--mode", choices=("v4", "v3"), default="v4",
                   help="v4 = museval default (global filters); v3 = per-window filters")
    args = p.parse_args(argv)

    from umx_tpu.eval.bss import bss_eval_images_framewise
    from umx_tpu.io.audio import load_audio

    refs, ests = [], []
    for i, t in enumerate(TARGETS):
        refs.append(load_audio(str(args.track_dir / f"{t}.wav")))
        ests.append(load_audio(str(args.est_dir / f"target_{i}.wav")))
    n = min(min(r.shape[1] for r in refs), min(e.shape[1] for e in ests))
    references = np.stack([r[:, :n] for r in refs]).astype(np.float64)
    estimates = np.stack([e[:, :n] for e in ests]).astype(np.float64)

    win = int(args.win * 44100)
    res = bss_eval_images_framewise(
        references, estimates, window=win, hop=win, flen=args.flen, mode=args.mode
    )

    print(f"{'stem':<8} {'SDR':>8} {'ISR':>8} {'SIR':>8} {'SAR':>8}")
    for j, t in enumerate(TARGETS):
        print(
            f"{t:<8} {res['median_SDR'][j]:>8.3f} {res['median_ISR'][j]:>8.3f} "
            f"{res['median_SIR'][j]:>8.3f} {res['median_SAR'][j]:>8.3f}"
        )

    if args.json:
        import json

        payload = {
            t: {
                m: float(res[f"median_{m}"][j])
                for m in ("SDR", "ISR", "SIR", "SAR")
            }
            for j, t in enumerate(TARGETS)
        }
        args.json.write_text(json.dumps(payload, indent=2))
        print(f"wrote {args.json}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
