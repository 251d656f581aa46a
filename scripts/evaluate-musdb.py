#!/usr/bin/env python
"""Full MUSDB18-HQ test-set evaluation: fleet demix + BSS-eval + the
published-style median table.

The reference workflow evaluates ONE track per process run
(umx.cpp + scripts/evaluate-demixed-output.py:19-52); this driver runs
the whole test set: tracks demix data-parallel across all chips
(engine/fleet.py), each result is BSS-evaluated (museval v4
conventions, umx_tpu/eval/bss.py), and the output is the standard
"median over tracks of median-over-windows SDR" per stem — the number
format of the MUSDB leaderboard and the reference README tables.

    python scripts/evaluate-musdb.py <model.bin.gz> <musdb_root/test> \\
        [--out results.json] [--limit N] [--shifts 1] [--no-wiener]

Each track directory must contain mixture.wav + bass/drums/other/
vocals.wav (the MUSDB18-HQ layout).  Multi-host runs: launch one
process per host; tracks partition automatically (parallel/multihost).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TARGETS = ("bass", "drums", "other", "vocals")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("model_file")
    p.add_argument("musdb_dir", type=Path, help="MUSDB18-HQ subset dir (e.g. .../test)")
    p.add_argument("--out", type=Path, default=None, help="write per-track JSON here")
    p.add_argument("--limit", type=int, default=0, help="evaluate only the first N tracks")
    p.add_argument("--shifts", type=int, default=1)
    p.add_argument("--no-wiener", action="store_true")
    p.add_argument("--segment-secs", type=float, default=60.0)
    p.add_argument("--win", type=float, default=1.0)
    p.add_argument("--flen", type=int, default=512)
    args = p.parse_args(argv)

    import dataclasses

    from umx_tpu.config import SegmentConfig
    from umx_tpu.engine.fleet import demix_tracks
    from umx_tpu.engine.separator import Separator
    from umx_tpu.eval.bss import bss_eval_images_framewise
    from umx_tpu.io.audio import load_audio
    from umx_tpu.parallel.multihost import allgather_metrics, partition_tracks

    track_dirs = sorted(
        d for d in args.musdb_dir.iterdir()
        if d.is_dir() and (d / "mixture.wav").exists()
        and all((d / f"{t}.wav").exists() for t in TARGETS)
    )
    if args.limit:
        track_dirs = track_dirs[: args.limit]
    if not track_dirs:
        print(f"no MUSDB track dirs under {args.musdb_dir}", file=sys.stderr)
        return 1

    sep = Separator.from_ggml(args.model_file)
    cfg = dataclasses.replace(
        sep.cfg,
        segment=SegmentConfig(segment_secs=args.segment_secs),
        shifts=args.shifts,
        use_wiener=not args.no_wiener,
    )

    import jax

    mesh = None
    if len(jax.local_devices()) > 1:
        from umx_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(devices=jax.local_devices())

    owned = partition_tracks(len(track_dirs))
    print(f"# {len(track_dirs)} tracks, this host owns {len(owned)}", file=sys.stderr)

    per_track: list[dict] = []
    win = int(args.win * 44100)
    t_all = time.perf_counter()
    for i in owned:
        d = track_dirs[i]
        mix = load_audio(str(d / "mixture.wav"))
        t0 = time.perf_counter()
        stems = demix_tracks(sep.params, [mix], cfg, mesh=mesh)[0]
        demix_s = time.perf_counter() - t0
        refs = np.stack(
            [load_audio(str(d / f"{t}.wav"))[:, : mix.shape[1]] for t in TARGETS]
        ).astype(np.float64)
        n = min(refs.shape[-1], stems.shape[-1])
        res = bss_eval_images_framewise(
            refs[..., :n], np.asarray(stems[..., :n], np.float64),
            window=win, hop=win, flen=args.flen, mode="v4",
        )
        row = {"track": d.name, "demix_s": round(demix_s, 2)}
        for m in ("sdr", "isr", "sir", "sar"):
            row[m] = {
                t: round(float(np.nanmedian(res[m.upper()][j])), 3)
                for j, t in enumerate(TARGETS)
            }
        per_track.append(row)
        print(json.dumps(row), flush=True)

    # gather each stem's per-track median SDRs across hosts, then take
    # the over-tracks median (the leaderboard statistic)
    table = {}
    for m in ("sdr", "isr", "sir", "sar"):
        table[m] = {}
        for j, t in enumerate(TARGETS):
            vals = allgather_metrics(
                {owned[k]: per_track[k][m][t] for k in range(len(per_track))}
            )
            table[m][t] = round(float(np.median(list(vals.values()))), 3)

    print(f"\n# {len(track_dirs)} tracks in {time.perf_counter() - t_all:.0f}s")
    print("| metric | " + " | ".join(TARGETS) + " |")
    print("|---|" + "---|" * len(TARGETS))
    for m in ("sdr", "isr", "sir", "sar"):
        print(f"| {m.upper()} | " + " | ".join(f"{table[m][t]:.3f}" for t in TARGETS) + " |")

    if args.out:
        args.out.write_text(json.dumps({"tracks": per_track, "median": table}, indent=1))
        print(f"# wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
