"""Host data-pipeline throughput benchmark (VERDICT r1 item 7).

Measures ScanNet loader scenes/sec with FULL train-time work per item
(disk npz read of a 150k-point scene, 80k-point subsample, flip/rotation
augmentation with vote updates, MAX_NUM_OBJ target padding, completion
occupancy/voxel loading) for three worker configurations:

  serial       — one item at a time on the calling thread
  thread pool  — ThreadPoolExecutor (GIL-bound numpy)
  process pool — ProcessPoolExecutor with per-worker dataset install
                 (the reference's 8-process torch DataLoader equivalent,
                 `models/iscnet/dataloader.py:267`)

The number to beat is the DEVICE train rate (40.4 scenes/sec/chip on
v5e, BASELINE.md): the host pipeline must exceed n_chips x that rate.
Prints one JSON line per configuration.

Usage: python tools/bench_loader.py [--scenes 16] [--workers 8]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RAW_POINTS = 150_000
N_OBJ_POINTS = 2048


def build_dataset_root(root: str, n_scenes: int, rng) -> tuple[str, str]:
    """Synthetic scenes + shapenet assets in the reference's on-disk
    layout (same contract as the dataset tests)."""
    from rfdnet_tpu.data.binvox import Voxels, write_binvox

    shapenet = os.path.join(root, "shapenet")
    catid, sid = "3001627", "abc123"
    os.makedirs(os.path.join(shapenet, "point", catid), exist_ok=True)
    os.makedirs(os.path.join(shapenet, "voxel", "16", catid), exist_ok=True)
    pts = (rng.rand(100_000, 3).astype(np.float16) - 0.5) * 1.1
    occ = np.packbits((rng.rand(100_000) > 0.5).astype(np.uint8))
    np.savez(os.path.join(shapenet, "point", catid, f"{sid}.npz"),
             points=pts, occupancies=occ)
    with open(os.path.join(shapenet, "voxel", "16", catid,
                           f"{sid}.binvox"), "wb") as f:
        write_binvox(f, Voxels(rng.rand(16, 16, 16) > 0.5, (16,) * 3,
                               [0, 0, 0], 1.0))

    entries = []
    for i in range(n_scenes):
        scene = f"scene{i:04d}_00"
        verts = rng.rand(RAW_POINTS, 6).astype(np.float32) * 4
        votes = np.zeros((RAW_POINTS, 10), np.float32)
        votes[: RAW_POINTS // 2, 0] = 1
        votes[: RAW_POINTS // 2, 1:] = rng.randn(RAW_POINTS // 2, 9)
        inst = rng.randint(0, 8, RAW_POINTS).astype(np.float32)
        np.savez(os.path.join(root, f"{scene}.npz"), mesh_vertices=verts,
                 point_votes=votes, instance_labels=inst)
        boxes = [{
            "box3D": np.array([1.0, 2.0, 0.5, 0.8, 0.6, 0.9, 0.3]),
            "cls_id": 7, "shapenet_catid": catid, "shapenet_id": sid,
            "instance_id": k + 1,
        } for k in range(6)]
        with open(os.path.join(root, f"{scene}_bbox.pkl"), "wb") as f:
            pickle.dump(boxes, f)
        entries.append({"scan": f"{scene}.npz", "bbox": f"{scene}_bbox.pkl"})
    split = os.path.join(root, "split.json")
    with open(split, "w") as f:
        json.dump(entries, f)
    return split, shapenet


def run_config(dataset, batch_size: int, num_workers: int,
               worker_type: str, epochs: int = 2) -> float:
    from rfdnet_tpu.data.scannet import DataLoader

    loader = DataLoader(dataset, batch_size, shuffle=True,
                        num_workers=num_workers, worker_type=worker_type)
    n = 0
    # warm epoch (page cache, pool spin-up) then timed epoch
    for _ in loader:
        pass
    t0 = time.perf_counter()
    for batch in loader:
        n += len(batch["point_clouds"])
    dt = time.perf_counter() - t0
    return n / dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=16)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    from rfdnet_tpu.data.scannet import ScanNetDataset

    with tempfile.TemporaryDirectory() as root:
        split, shapenet = build_dataset_root(
            root, args.scenes, np.random.RandomState(0)
        )
        ds = ScanNetDataset(split, mode="train", phase="completion",
                            num_points=80_000, shapenet_path=shapenet)
        configs = [("serial", 1, "thread")]
        if (os.cpu_count() or 1) > 1:
            configs += [("thread", args.workers, "thread"),
                        ("process", args.workers, "process")]
        else:
            configs += [("process", 2, "process")]
        for name, workers, wtype in configs:
            rate = run_config(ds, args.batch, workers, wtype)
            print(json.dumps({
                "metric": f"loader_scenes_per_sec_{name}",
                "value": round(rate, 2),
                "unit": "scenes/sec",
                "workers": workers,
                "host_cores": os.cpu_count(),
            }))


if __name__ == "__main__":
    main()
