"""Heading-learning diagnostic (VERDICT r3 item 5).

Overfits the detection phase on a tiny fixed scene subset and reports the
heading_cls_loss trajectory: chance level is ln(12)=2.485, so a healthy
supervision path must drive it well below that when memorizing 8 scenes.
Run with --no-augment to isolate the augmentation's heading update
(flips/rotation, `dataloader.py:83-115`) from the raw supervision path.

Usage:
  python tools/diag_heading.py --root out/synth_ds --out out/diag_heading \
      [--scenes 8] [--epochs 300] [--no-augment] [--points 80000]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)

import yaml


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--scenes", type=int, default=8)
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--points", type=int, default=80_000)
    p.add_argument("--no-augment", action="store_true")
    args = p.parse_args(argv)
    root = os.path.abspath(args.root)
    out = os.path.abspath(args.out)
    os.makedirs(out, exist_ok=True)

    # tiny split: first N train scenes; a single-scene val (the diag's
    # signal is the TRAIN heading_cls trajectory — val just satisfies the
    # loop's plumbing)
    src = json.load(open(os.path.join(root, "splits", "scannetv2_train.json")))
    subset = []
    for e in src[: args.scenes]:
        subset.append({
            k: os.path.abspath(os.path.join(root, "splits", v))
            for k, v in e.items()
        })
    split_dir = os.path.join(out, "splits")
    os.makedirs(split_dir, exist_ok=True)
    with open(os.path.join(split_dir, "scannetv2_train.json"), "w") as f:
        json.dump(subset, f)
    with open(os.path.join(split_dir, "scannetv2_val.json"), "w") as f:
        json.dump(subset[:1], f)

    # checkpoint saves dominate tiny-epoch wall time (~8 s/epoch orbax on
    # a 1-core host); the diag needs none
    from rfdnet_tpu.train import checkpoint as _ck

    _ck.CheckpointIO.save_last = lambda self, *a, **k: None
    _ck.CheckpointIO.save_best = lambda self, *a, **k: None

    cfg = {
        "seed": 10,
        "data": {"num_point": args.points, "split": split_dir,
                 "shapenet_path": os.path.join(root, "shapenet"),
                 "augment": not args.no_augment},
        "train": {"phase": "detection", "batch_size": args.scenes,
                  "epochs": args.epochs, "freeze": []},
        "val": {"phase": "detection", "batch_size": 1},
        "optimizer": {"lr": 1e-3},
        "scheduler": {"patience": 1_000_000, "factor": 0.1, "threshold": 0.01},
        "device": {"num_workers": 4},
        "log": {"path": out, "print_step": 1},
    }
    y = os.path.join(out, "diag.yaml")
    with open(y, "w") as f:
        yaml.safe_dump(cfg, f)

    from rfdnet_tpu import cli

    cli.main(["--config", y, "--mode", "train"])

    # summarize: heading_cls at start / min / end
    import glob

    run = sorted(glob.glob(os.path.join(out, "*", "log.txt")))[-1]
    series = [
        float(m) for m in re.findall(
            r"train epoch \d+ iter \d+/\d+: .*?heading_cls_loss: ([\d.]+)",
            open(run).read(),
        )
    ]
    summary = {
        "augment": not args.no_augment,
        "n_steps": len(series),
        "first": series[0] if series else None,
        "min": min(series) if series else None,
        "last": series[-1] if series else None,
        "chance_ln12": 2.4849,
    }
    print(json.dumps(summary, indent=2))
    with open(os.path.join(out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    return summary


if __name__ == "__main__":
    main()
