"""Batch demixer: demix a directory of tracks with the fleet runner,
tracks sharded data-parallel across all available chips.

    python -m umx_tpu.cli_batch <model file> <in_dir> <out_root>

Writes <out_root>/<track_stem>/target_{0..3}.wav per input WAV.  This is
the throughput path for BASELINE config 5 (full MUSDB18-HQ test set on a
multi-chip mesh); the reference has no batch mode at all (one track per
process, umx.cpp:26-96).
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="umx-tpu-batch", description=__doc__)
    p.add_argument("model_file")
    p.add_argument("in_dir", help="directory of 44.1 kHz WAVs (or MUSDB track dirs)")
    p.add_argument("out_root")
    p.add_argument("--no-wiener", action="store_true")
    p.add_argument("--shifts", type=int, default=1)
    p.add_argument("--segment-secs", type=float, default=60.0)
    p.add_argument("--quantized-hbm", action="store_true")
    p.add_argument("--quiet", action="store_true")
    args = p.parse_args(argv)

    def log(*a):
        if not args.quiet:
            print(*a, flush=True)

    import dataclasses

    from umx_tpu.config import SegmentConfig
    from umx_tpu.engine.fleet import demix_tracks
    from umx_tpu.engine.separator import Separator
    from umx_tpu.io.audio import load_audio, write_audio
    from umx_tpu.parallel.mesh import make_mesh

    sep = Separator.from_ggml(args.model_file, quantized_hbm=args.quantized_hbm)
    cfg = dataclasses.replace(
        sep.cfg,
        segment=SegmentConfig(segment_secs=args.segment_secs),
        use_wiener=not args.no_wiener,
        shifts=args.shifts,
    )

    # accept flat WAVs or MUSDB-style track dirs containing mixture.wav
    entries = []
    for name in sorted(os.listdir(args.in_dir)):
        path = os.path.join(args.in_dir, name)
        if os.path.isdir(path) and os.path.exists(os.path.join(path, "mixture.wav")):
            entries.append((name, os.path.join(path, "mixture.wav")))
        elif name.lower().endswith(".wav"):
            entries.append((os.path.splitext(name)[0], path))
    if not entries:
        print(f"no WAVs found in {args.in_dir}", file=sys.stderr)
        return 1

    log(f"{len(entries)} tracks; loading audio")
    tracks = [load_audio(path, cfg.dsp.sample_rate) for _, path in entries]
    total_secs = sum(t.shape[1] for t in tracks) / cfg.dsp.sample_rate

    mesh = make_mesh()
    log(f"mesh: {dict(mesh.shape)} over {len(mesh.devices.flat)} device(s)")

    t0 = time.perf_counter()
    outs = demix_tracks(sep.params, tracks, cfg, mesh=mesh)
    wall = time.perf_counter() - t0
    log(f"demixed {total_secs:.0f}s of audio in {wall:.1f}s "
        f"({total_secs / wall:.0f}x realtime aggregate)")

    for (name, _), stems in zip(entries, outs):
        out_dir = os.path.join(args.out_root, name)
        os.makedirs(out_dir, exist_ok=True)
        for i in range(stems.shape[0]):
            write_audio(os.path.join(out_dir, f"target_{i}.wav"), stems[i], cfg.dsp.sample_rate)
        log(f"wrote {out_dir}/target_{{0..3}}.wav")
    return 0


if __name__ == "__main__":
    sys.exit(main())
