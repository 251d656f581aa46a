#!/usr/bin/env python
"""Train a UMX mask network on a directory of stem folders
(<root>/<track>/{bass,drums,other,vocals}.wav) and export ggml weights.

The full lifecycle the vendored open-unmix-pytorch covers for the
reference: train → quantize → serve with the same engine.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("data_root", help="directory of stem track folders")
    p.add_argument("out_model", help="output ggml path (.bin or .bin.gz)")
    p.add_argument("--hidden-size", type=int, default=512)
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--seq-len", type=int, default=256, help="frames per example")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--mesh", action="store_true", help="shard over all devices (dp x tp)")
    args = p.parse_args(argv)

    from umx_tpu.config import DSPConfig, ModelConfig
    from umx_tpu.data import StemDataset, train_loop
    from umx_tpu.train import TrainConfig, export_ggml

    mcfg = ModelConfig(hidden_size=args.hidden_size)
    tcfg = TrainConfig(learning_rate=args.lr, seq_len=args.seq_len)
    dsp = DSPConfig()
    dataset = StemDataset(
        args.data_root, excerpt_samples=dsp.hop * (args.seq_len - 1)
    )
    print(f"{len(dataset.tracks)} training tracks")

    mesh = None
    if args.mesh:
        from umx_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        print(f"mesh: {dict(mesh.shape)}")

    state, losses = train_loop(
        dataset, mcfg, tcfg, steps=args.steps, batch_size=args.batch_size,
        mesh=mesh, checkpoint_dir=args.checkpoint_dir,
    )
    print(f"final loss {losses[-1]:.5f}")
    export_ggml(state.params, args.out_model, mcfg)
    print(f"wrote {args.out_model}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
