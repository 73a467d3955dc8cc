"""CLI entry point: `python -m rfdnet_tpu --config <yaml> --mode
{train,test,demo} [--demo_path ...]`.

Semantic rebuild of `main.py:8-38` + the `train.py` / `test.py` / `demo.py`
run() drivers: one argparse surface, config load, environment seeding,
then mode dispatch.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from .config.config import Config
from .utils.logging import LogBoard, initiate_environment


def _build_loaders(cfg: Config, modes):
    from .data.scannet import DataLoader, ScanNetDataset

    d = cfg.config["data"]
    loaders = {}
    for mode in modes:
        split_mode = {"train": "train", "val": "val", "test": "val"}[mode]
        split_file = os.path.join(d["split"], f"scannetv2_{split_mode}.json")
        ds = ScanNetDataset(
            split_file,
            mode=mode,
            phase=cfg.config[mode]["phase"],
            num_points=d["num_point"],
            use_color_detection=d["use_color_detection"],
            use_color_completion=d["use_color_completion"],
            use_height=not d["no_height"],
            points_subsample=d["points_subsample"],
            points_unpackbits=d["points_unpackbits"],
            shapenet_path=d.get("shapenet_path"),
            dataset_config=cfg.dataset_config,
            seed=cfg.config.get("seed", 10),
            augment=d.get("augment"),
            # per-worker LRU caches of decoded npz/binvox (entry counts;
            # decode cost dominates small-core hosts — see ScanNetDataset)
            cache_scans=int(d.get("cache_scans", 0)),
            cache_shapenet=int(d.get("cache_shapenet", 256)),
        )
        loaders[mode] = DataLoader(
            ds,
            batch_size=cfg.config[mode].get("batch_size", 1),
            shuffle=mode == "train",
            num_workers=cfg.config["device"].get("num_workers", 8) or 1,
            seed=cfg.config.get("seed", 10),
        )
    return loaders


def run_train(cfg: Config):
    from .train.checkpoint import CheckpointIO
    from .train.loop import train

    loaders = _build_loaders(cfg, ["train", "val"])
    model = cfg.build_model()
    checkpoint = CheckpointIO(cfg.save_path, log=cfg.log_string)
    board = LogBoard(cfg.save_path)
    return train(
        cfg, model, cfg.dataset_config, loaders["train"], loaders["val"],
        checkpoint=checkpoint, board=board, log=cfg.log_string,
    )


def _restore_variables(cfg: Config, model, sample_batch):
    """Init the model then partial-load the configured weights
    (`parse_checkpoint` finetune/weight semantics)."""
    import jax
    import jax.numpy as jnp

    from .train.checkpoint import CheckpointIO, partial_load

    batch = {
        k: jnp.asarray(v) for k, v in sample_batch.items()
        if not isinstance(v, list)
    }
    if "center_label" not in batch:
        # demo mode: raw scans carry no GT labels, but the train forward
        # used for init needs them to trace every submodule — init on a
        # tiny synthetic labeled batch instead (param/stat shapes are
        # independent of the point count)
        from .data.synthetic import synthetic_scene_batch

        pc = batch["point_clouds"]
        synth = synthetic_scene_batch(
            np.random.RandomState(0), batch_size=1, num_points=4096,
            mean_size_arr=np.asarray(cfg.dataset_config.mean_size_arr),
        )
        synth["point_clouds"] = synth["point_clouds"][..., : pc.shape[2]]
        batch = {k: jnp.asarray(v) for k, v in synth.items()}
    variables = model.init(
        jax.random.PRNGKey(cfg.config.get("seed", 10)), batch,
        train=False, rng=jax.random.PRNGKey(0),
    )
    params, stats = variables["params"], variables.get("batch_stats", {})
    ckpt = CheckpointIO(cfg.save_path or ".", log=cfg.log_string)
    for w in cfg.config.get("weight", []):
        if os.path.isdir(w):
            src, _ = ckpt.load(w)
            params = partial_load(params, src["params"], cfg.log_string)
            stats = partial_load(stats, src.get("batch_stats", {}), log=None)
        else:
            cfg.log_string(f"Warning: weight path {w} not found.")
    return {"params": params, "batch_stats": stats}


def run_test(cfg: Config):
    from .eval.tester import Tester

    loaders = _build_loaders(cfg, ["test"])
    model = cfg.build_model()
    sample = next(iter(loaders["test"]))
    variables = _restore_variables(cfg, model, sample)
    tester = Tester(cfg, model, variables, cfg.dataset_config,
                    log=cfg.log_string)
    thresholds = cfg.config["test"].get("ap_iou_thresholds", [0.5])
    dump_dir = None
    if cfg.config["generation"].get("dump_results"):
        dump_dir = os.path.join(
            cfg.save_path or "out/test", cfg.config["log"]["vis_path"]
        )
    metrics = tester.run(
        loaders["test"], ap_iou_thresholds=thresholds, dump_dir=dump_dir
    )
    for line in format_ap_table(metrics, thresholds):
        cfg.log_string(line)
    return metrics


def format_ap_table(metrics: dict, thresholds) -> list:
    """Per-class AP/AR table like the reference's end-of-test print
    (`test_epoch.py:62-68`)."""
    lines = []
    for t in thresholds:
        lines.append(f"----- AP @ IoU {t} -----")
        lines.append(f"{'class':<16}{'AP':>10}{'Recall':>10}")
        for k in sorted(metrics):
            if k.endswith(f"Average Precision @{t}"):
                cls = k[: -len(f" Average Precision @{t}")]
                rec = metrics.get(f"{cls} Recall @{t}", 0.0)
                lines.append(f"{cls:<16}{metrics[k]:>10.4f}{rec:>10.4f}")
        for agg in ("mAP", "AR", "mAP_mesh", "AR_mesh"):
            key = f"{agg} @{t}"
            if key in metrics:
                lines.append(f"{agg:<16}{metrics[key]:>10.4f}")
    for k, v in sorted(metrics.items()):
        if "voxel IoU" in k:
            lines.append(f"{k}: {v:.4f}")
    return lines


def run_demo(cfg: Config, demo_path: str):
    from .demo import run as demo_run

    return demo_run(cfg, demo_path)


def parse_args(argv=None):
    parser = argparse.ArgumentParser("rfdnet_tpu: TPU-native RfD-Net")
    parser.add_argument("--config", type=str, default=None,
                        help="experiment yaml (reference schema)")
    parser.add_argument("--mode", type=str, default="train",
                        choices=["train", "test", "demo"])
    parser.add_argument("--demo_path", type=str,
                        default="demo/inputs/scene0549_00.off")
    parser.add_argument("--profile", type=str, default=None,
                        help="capture a jax.profiler trace to this dir")
    return parser.parse_args(argv)


def main(argv=None):
    import contextlib

    args = parse_args(argv)
    cfg = Config(args.config, mode=args.mode)
    initiate_environment(cfg.config.get("seed", 10))
    cfg.log_string(f"mode: {args.mode}")
    ctx = contextlib.nullcontext()
    if args.profile:
        from .utils.profiling import trace

        ctx = trace(args.profile)
    with ctx:
        if args.mode == "train":
            return run_train(cfg)
        if args.mode == "test":
            return run_test(cfg)
        return run_demo(cfg, args.demo_path)


if __name__ == "__main__":
    main()
