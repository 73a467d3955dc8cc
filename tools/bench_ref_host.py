"""Measure the reference's CPU-side test-protocol stages (VERDICT r2
item 5): a measured floor under bench.py's `vs_baseline` denominator.

The reference's per-scene protocol work splits into (a) GPU network
forward + occupancy decode and (b) HOST post-processing that is pure
numpy/python and therefore runnable (and timeable) in this environment:

- `parse_predictions` (`net_utils/ap_helper.py:131-264`): python loop
  over B x 256 proposals doing per-proposal box decoding (`get_3d_box`,
  `box_util.py:183`), the optional in-hull point test
  (scipy Delaunay over the 80k-point scene — `faster_eval` /
  remove_empty_box), and `nms_3d_faster_samecls` (`nms.py:79-118`);
- `parse_groundtruths` (`ap_helper.py:326-368`);
- `assembly_pred_map_cls` (`ap_helper.py:267-323`, per_class_proposal).

The reference runs these serially per scene (batch_size=1 at test,
`ISCNet_test.yaml:50`); its eval Pools only parallelize mesh
voxelization and per-class AP, not this path. The host time measured
here is therefore a per-scene LOWER bound on the reference's test-time
cost, i.e. `1 / t_host` is an UPPER bound on reference scenes/sec — a
defensible denominator for `vs_baseline` that no GPU could beat without
rewriting the reference's host code.

Usage:  python tools/bench_ref_host.py  [--scenes 10]
Writes the derived numbers to stdout as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build_scene(rng, K=256, N=80000, num_class=8, nh=12, ns=8, M=64):
    """Synthetic end_points + data in the reference's tensor contract."""
    import torch

    def t(a):
        return torch.from_numpy(a.astype(np.float32))

    end_points = {
        "center": t(rng.randn(1, K, 3) * 1.5),
        "objectness_scores": t(rng.randn(1, K, 2)),
        "heading_scores": t(rng.randn(1, K, nh)),
        "heading_residuals_normalized": t(rng.randn(1, K, nh) * 0.1),
        "size_scores": t(rng.randn(1, K, ns)),
        "size_residuals_normalized": t(rng.randn(1, K, ns, 3) * 0.1),
        "sem_cls_scores": t(rng.randn(1, K, num_class)),
    }
    data = {
        "point_clouds": t(rng.randn(1, N, 4) * 1.5),
        "center_label": t(rng.randn(1, M, 3)),
        "heading_class_label": torch.zeros(1, M).long(),
        "heading_residual_label": t(np.zeros((1, M))),
        "size_class_label": torch.zeros(1, M).long(),
        "size_residual_label": t(np.zeros((1, M, 3))),
        "sem_cls_label": torch.zeros(1, M).long(),
        "box_label_mask": t((np.arange(M) < 8).astype(np.float32)[None]),
    }
    return end_points, data


def bench_ref_generation_host(nprop=64, reps=3):
    """Host floor of the reference's per-scene mesh generation
    (`models/iscnet/modules/generator.py:145-197`): after the GPU decode,
    each proposal's padded 33^3 grid goes through PyMCubes marching cubes
    + trimesh assembly ON THE HOST, serially. PyMCubes is not installed
    here, so the stage is timed with OUR C++ extractor (single-proposal
    path, one call per proposal exactly like the reference's loop) —
    strictly FASTER than PyMCubes' non-sign-pruned scan, so adding it
    keeps the total a valid lower bound on the reference's host cost.
    The np.pad per proposal is the reference's own
    (`generator.py:157-159`)."""
    from rfdnet_tpu.meshing.native import marching_cubes

    rng = np.random.RandomState(0)
    res = 33  # resolution_0=32 -> pointsf grid is (res0+1)^3
    ax = np.linspace(-0.55, 0.55, res)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    pts = np.stack([X, Y, Z], -1)
    grids = []
    for _ in range(nprop):
        c = rng.uniform(-0.05, 0.05, 3)
        r = np.linalg.norm((pts - c) * rng.uniform(0.8, 1.3, 3), axis=-1)
        bump = 0.15 * np.sin(7 * pts[..., 0]) * np.cos(5 * pts[..., 1])
        grids.append((40.0 * (0.33 + bump - r)).astype(np.float32))
    # warmup (builds the case table / the .so)
    marching_cubes(np.pad(grids[0], 1, constant_values=-1e6), 0.0)
    t0 = time.perf_counter()
    for _ in range(reps):
        for g in grids:
            padded = np.pad(g, 1, constant_values=-1e6)
            marching_cubes(padded, 0.0)
    return (time.perf_counter() - t0) / reps


def measure_host_floor(scenes: int = 10) -> dict:
    """Measure the reference's serial per-scene HOST stages on THIS
    machine and return the derived throughput upper bound. Called by
    `bench.py` at bench time so the `vs_baseline` denominator is always
    a same-host, same-session measurement (the floor scales with
    single-core CPU speed — a constant recorded on one box overstates
    or understates the ratio on another)."""
    from ref_torch import install_reference

    install_reference()
    from net_utils.ap_helper import (
        assembly_pred_map_cls,
        parse_groundtruths,
        parse_predictions,
    )
    from test_parity_torch import _ref_dataset_config

    dc = _ref_dataset_config()
    eval_config = {
        "remove_empty_box": True,  # ISCNet_test.yaml faster_eval
        "use_3d_nms": True,
        "nms_iou": 0.25,
        "use_old_type_nms": False,
        "cls_nms": True,
        "per_class_proposal": True,
        "conf_thresh": 0.05,
        "dataset_config": dc,
    }

    rng = np.random.RandomState(0)
    scene_list = [build_scene(rng) for _ in range(scenes)]

    # warmup (scipy Delaunay caches nothing, but import costs do)
    parse_predictions(
        {k: v.clone() for k, v in scene_list[0][0].items()},
        scene_list[0][1], eval_config,
    )

    t_parse = t_gt = t_asm = 0.0
    for end_points, data in scene_list:
        ep = {k: v.clone() for k, v in end_points.items()}
        t0 = time.perf_counter()
        eval_dict, parsed = parse_predictions(ep, data, eval_config)
        t1 = time.perf_counter()
        gts = parse_groundtruths(data, eval_config)
        t2 = time.perf_counter()
        eval_dict = assembly_pred_map_cls(eval_dict, parsed, eval_config)
        t3 = time.perf_counter()
        t_parse += t1 - t0
        t_gt += t2 - t1
        t_asm += t3 - t2

    n = scenes
    t_gen = bench_ref_generation_host()
    host_per_scene = (t_parse + t_gt + t_asm) / n + t_gen
    return {
        "scenes": n,
        "parse_predictions_s": t_parse / n,
        "parse_groundtruths_s": t_gt / n,
        "assembly_s": t_asm / n,
        "generation_mc_s": t_gen,
        "host_per_scene_s": host_per_scene,
        "ref_scenes_per_sec_upper_bound": 1.0 / host_per_scene,
        "note": "host-only stages of the reference protocol "
                "(ap_helper.py:131-368 + generator.py:145-197 marching "
                "cubes, timed with our FASTER extractor); excludes ALL "
                "GPU forward/decode time, so 1/t is an upper bound on "
                "reference throughput",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=10)
    args = ap.parse_args()
    print(json.dumps(measure_host_floor(args.scenes)))


if __name__ == "__main__":
    main()
