"""Test-time driver: per-scene generation, AP accumulation, voxel-IoU
stats, optional mesh-mAP and visualization dumps.

Semantic rebuild of `test.py` + `test_epoch.py:10-68` +
`models/iscnet/testing.py` (Tester): for each val scene run the jitted
generate program (detection + NMS + completion conditioning + eval losses
+ 16^3 shape voxels), extract meshes on the host (batched dense-grid or
MISE), optionally refit boxes to the scan, assemble per-class
(cls, box[, mesh], score) tuples, and accumulate VOC AP.

The reference's device<->host ping-pong (per-proposal chunked decoder
evals, Python NMS and box-decode loops — `ap_helper.py:131-264`) is
replaced by one fixed-shape device program per scene; only marching cubes
and AP bookkeeping stay on the host.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..meshing.generator import Generator3D
from ..models.iscnet import ISCNet
from .ap_helper import (
    APCalculator,
    assembly_gt_map_cls,
    assembly_pred_map_cls,
    parse_groundtruths,
)
from .mesh_iou import mesh_iou, voxelize_mesh_pair
from .refit import fit_meshes_to_scan


def compute_iou(occ1: np.ndarray, occ2: np.ndarray) -> np.ndarray:
    """Batched boolean-set IoU over flattened trailing dims
    (`external/common.py:7-35`)."""
    occ1 = np.asarray(occ1).reshape(occ1.shape[0], -1) >= 0.5
    occ2 = np.asarray(occ2).reshape(occ2.shape[0], -1) >= 0.5
    union = (occ1 | occ2).sum(axis=-1)
    inter = (occ1 & occ2).sum(axis=-1)
    return inter / np.maximum(union, 1)


class Tester:
    def __init__(self, cfg, model: ISCNet, variables, dataset_config,
                 log=print):
        self.cfg = cfg
        self.model = model
        self.variables = variables
        self.dataset_config = dataset_config
        self.log = log
        ec = cfg.eval_config
        gen_cfg = cfg.config["generation"]
        mode = cfg.config["mode"]
        self.evaluate_mesh_mAP = (
            cfg.config.get(mode, {}).get("evaluate_mesh_mAP", False)
            and gen_cfg["generate_mesh"]
        )
        self.dump_threshold = (
            ec["conf_thresh"] if self.evaluate_mesh_mAP
            else gen_cfg["dump_threshold"]
        )
        self.generate_mesh = gen_cfg["generate_mesh"]
        self.fit_to_scan = cfg.config.get(mode, {}).get(
            "phase", ""
        ) == "completion" and self.generate_mesh

        z_rng = (jax.random.PRNGKey(42)
                 if gen_cfg.get("use_sampling") else None)
        # dense-grid mode: decode every proposal's occupancy grid inside
        # the SAME jitted program as detection+completion (one device
        # dispatch per scene; only marching cubes stays on the host)
        self._fused_grid_res = (
            gen_cfg["resolution_0"]
            if self.generate_mesh and gen_cfg["upsampling_steps"] == 0
            else None
        )
        # fused Pallas decoder chain on TPU (ops/cbn_decoder.py, 2.3x the
        # unfused f32 decode); the flax chain elsewhere (the kernel only
        # interprets off-TPU, which is far slower than XLA CPU).
        # Numerics-gated (ADVICE r2): the kernel runs bf16-operand
        # matmuls, so it is the default ONLY when the config opted into
        # bf16 decode (`data.decoder_bf16`); `generation.decoder_impl`
        # ("pallas" | "flax") overrides either way, keeping f32-parity
        # protocol runs possible on TPU.
        impl_cfg = gen_cfg.get("decoder_impl")
        if impl_cfg is not None:
            impl = impl_cfg if impl_cfg != "flax" else None
        else:
            impl = (
                "pallas"
                if jax.default_backend() == "tpu"
                and cfg.config["data"].get("decoder_bf16")
                else None
            )
        thr = cfg.config["data"]["threshold"]
        self._grid_iso = float(np.log(thr) - np.log(1.0 - thr))
        # transfer-sparse grids by default (sign bits + iso-neighborhood
        # values; byte-identical meshes, ~4-8x less tunnel traffic);
        # `generation.grid_sparse: false` restores dense f16 downloads
        sparse_on = gen_cfg.get("grid_sparse", True) and self._fused_grid_res
        self._sparse_budget = (
            int(gen_cfg.get("grid_sparse_budget", 1 << 19))
            if sparse_on else None
        )
        self._gen_kw = dict(
            nms_iou=ec["nms_iou"],
            use_cls_nms=ec["cls_nms"],
            dump_threshold=self.dump_threshold,
            remove_empty_box=ec.get("remove_empty_box", False),
            decode_grid_res=self._fused_grid_res,
            grid_rng=z_rng,
            # transfer-only quantization of the logit grids (the
            # largest device->host output); decoder math stays f32
            grid_dtype="float16" if self._fused_grid_res else None,
            grid_impl=impl,
        )
        self._gen_fn = jax.jit(partial(
            self._apply_generate,
            grid_sparse_budget=self._sparse_budget,
            grid_iso=self._grid_iso,
            **self._gen_kw,
        ))
        self.__gen_fn_dense = None
        # f16 at the jit boundary: transfer-only quantization of the
        # chunked MISE logits (decoder math stays f32); clipped to the
        # f16 finite range so extreme logits can't overflow to inf and
        # NaN marching-cubes interpolation
        decode = jax.jit(
            lambda f, c, p: jnp.clip(
                model.apply(
                    variables, f, c, p, method=ISCNet.decode_occupancy,
                    mutable=False, rng=z_rng, impl=impl,
                ), -6e4, 6e4,
            ).astype("float16")
        )
        # gradient-capable decode for refine_mesh / estimate_normals
        # (the Pallas kernel has no automatic VJP)
        decode_grad = jax.jit(
            lambda f, c, p: model.apply(
                variables, f, c, p, method=ISCNet.decode_occupancy,
                mutable=False, rng=z_rng,
            )
        )
        self.generator = Generator3D(
            decode,
            threshold=cfg.config["data"]["threshold"],
            resolution0=gen_cfg["resolution_0"],
            upsampling_steps=gen_cfg["upsampling_steps"],
            refinement_step=gen_cfg.get("refinement_step", 0) or 0,
            simplify_nfaces=gen_cfg.get("simplify_nfaces"),
            with_normals=gen_cfg.get("with_normals", False),
            decode_fn_grad=decode_grad,
        )
        self.voxel_pool = ThreadPoolExecutor(8)
        # counts-sized valid-prefix downloads of the sparse-grid payload
        # (meshing/transfer.py); byte counter feeds the bench/driver stats
        from ..meshing.transfer import SparseGridFetcher

        self._fetcher = SparseGridFetcher()
        self.transfer_down_bytes = 0

    def _apply_generate(self, variables, batch, **kw):
        return self.model.apply(
            variables, batch, method=ISCNet.generate, mutable=False, **kw
        )

    @property
    def _gen_fn_dense(self):
        """Dense-grid generate (sparse-budget-overflow fallback), built
        on first use."""
        if self.__gen_fn_dense is None:
            self.__gen_fn_dense = jax.jit(
                partial(self._apply_generate, **self._gen_kw)
            )
        return self.__gen_fn_dense

    # ---------------------------------------------------------------- step
    def dispatch_step(self, batch: dict) -> dict:
        """Launch one scene's device program (async) and materialize its
        outputs in a background thread: np.asarray releases the GIL during
        the device->host copy, so scene i+1's transfer overlaps scene i's
        host mesh extraction (the reference's loop is fully serial,
        `test_epoch.py:10-41`). Pair with `consume_step`."""
        import threading

        device_batch = {
            k: v for k, v in batch.items()
            if not isinstance(v, list) and k not in
            ("object_voxels", "object_points_iou", "object_points_iou_occ",
             "shapenet_catids", "shapenet_ids", "scan_idx")
        }
        out = self._gen_fn(self.variables, device_batch)
        # async-copy ONLY what materialize() reads: `out` also carries
        # end_points (seed/vote features, ~MBs) and the per-proposal
        # conditioning codes, which stay device-resident — copying every
        # leaf was pure wasted device->host traffic (VERDICT r5 prep)
        gen_dev = out.get("gen", {})
        needed = [
            out["parsed"],
            {k: v for k, v in gen_dev.items()
             if k not in ("features", "cls_codes")},
            out.get("completion_loss"),
            out.get("grids"),
        ]
        sparse_ok = (
            out.get("grid_bits") is not None
            and out["grid_bits"].shape[0] == gen_dev.get(
                "valid", np.zeros((1, 0))
            ).reshape(-1).shape[0]
        )
        if not sparse_ok:
            needed += [out.get("grid_bits"), out.get("grid_vals"),
                       out.get("shape_voxels_bits"),
                       out.get("shape_voxels")]
        needed.append(out.get("grid_counts"))
        for leaf in jax.tree_util.tree_leaves(needed):
            try:
                leaf.copy_to_host_async()
            except AttributeError:
                pass
        box: dict = {}

        def fetch(v):
            a = np.asarray(v)
            self.transfer_down_bytes += a.nbytes
            return a

        def materialize():
            try:
                box["parsed"] = {
                    k: fetch(v) for k, v in out["parsed"].items()
                }
                # features/cls_codes stay DEVICE arrays: the host only
                # needs them for refine/normals (off in every shipped
                # config), and the generator indexes them lazily
                box["gen"] = (
                    {k: (v if k in ("features", "cls_codes") else fetch(v))
                     for k, v in gen_dev.items()}
                    if "gen" in out else {}
                )
                if "completion_loss" in out:
                    box["completion_loss"] = float(out["completion_loss"])
                    self.transfer_down_bytes += 4
                if sparse_ok:
                    counts = fetch(out["grid_counts"])
                    res = self._fetcher.fetch(
                        out["grid_bits"], out["grid_vals"], counts,
                        box["gen"]["valid"],
                        vox=out.get("shape_voxels_bits"),
                    )
                    if res is not None:
                        bits_np, vals_np, vox_np = res
                        self.transfer_down_bytes += self._fetcher.last_bytes
                        box["grid_bits"] = bits_np
                        box["grid_vals"] = vals_np
                        box["grid_counts"] = counts
                        if vox_np is not None:
                            box["shape_voxels_bits"] = vox_np
                    else:
                        # budget overflow: ship counts so consume_step's
                        # meshes_from_sparse_grids triggers the dense
                        # re-dispatch fallback
                        box["grid_bits"] = fetch(out["grid_bits"])
                        box["grid_vals"] = np.zeros((0,), np.float16)
                        box["grid_counts"] = counts
                elif out.get("grid_bits") is not None:
                    box["grid_bits"] = fetch(out["grid_bits"])
                    box["grid_vals"] = fetch(out["grid_vals"])
                    box["grid_counts"] = fetch(out["grid_counts"])
                if "shape_voxels_bits" not in box:
                    if out.get("shape_voxels_bits") is not None:
                        box["shape_voxels_bits"] = fetch(
                            out["shape_voxels_bits"]
                        )
                    elif out.get("shape_voxels") is not None:
                        # pre-bit-packing generate output (compat)
                        v = fetch(out["shape_voxels"])
                        box["shape_voxels_bits"] = np.packbits(
                            (v >= 0.5).reshape(v.shape[0], -1), axis=-1
                        )
                if "grids" in out:
                    box["grids"] = fetch(out["grids"])
            except Exception as e:  # surfaced at consume time
                box["err"] = e

        th = threading.Thread(target=materialize)
        th.start()
        return {"out": out, "box": box, "th": th, "batch": batch,
                "device_batch": device_batch}

    def test_step(self, batch: dict) -> dict:
        return self.consume_step(self.dispatch_step(batch))

    def consume_step(self, pending: dict) -> dict:
        pending["th"].join()
        box = pending["box"]
        if "err" in box:
            raise box["err"]
        out, batch = pending["out"], pending["batch"]
        parsed = box["parsed"]
        gen = box["gen"]
        point_clouds = np.asarray(batch["point_clouds"])
        if gen:
            B, G, _ = gen["proposal_ids"].shape

        losses = {"total": 0.0}
        if "completion_loss" in out:
            losses["completion loss"] = float(out["completion_loss"])
            losses["mask loss"] = float(gen.get("mask_loss", 0.0))
            losses["total"] = losses["completion loss"]

        # per-class voxel IoU stats (`network.py:144-150`)
        iou_stats = None
        if gen and "shape_voxels_bits" in box and "object_voxels" in batch:
            voxels = np.unpackbits(
                box["shape_voxels_bits"], axis=-1
            ).reshape(B * G, 16, 16, 16)
            gt_ids = gen["proposal_ids"][..., 1].reshape(-1)
            gt_vox = np.asarray(batch["object_voxels"])[
                np.repeat(np.arange(B), G), gt_ids
            ]
            valid = gen["valid"].reshape(-1).astype(bool)
            ious = compute_iou(voxels[valid], gt_vox[valid])
            iou_stats = {
                "cls": gen["proposal_ids"][..., 2].reshape(-1)[valid],
                "iou": ious,
            }

        # host mesh extraction for all valid proposals in one batched pass
        meshes = None
        if gen and self.generate_mesh and "features" in gen:
            if "grid_bits" in box:  # transfer-sparse dense-grid path
                meshes = self.generator.meshes_from_sparse_grids(
                    box["grid_bits"], box["grid_vals"], box["grid_counts"],
                    self._fused_grid_res, valid=gen["valid"].reshape(-1),
                    features=gen["features"], cls_codes=gen["cls_codes"],
                )
                if meshes is None:
                    # budget overflow: dense re-dispatch for this scene
                    self.log("[tester] sparse-grid budget overflow; "
                             "dense fallback")
                    dense = self._gen_fn_dense(self.variables, pending["device_batch"])
                    meshes = self.generator.meshes_from_grids(
                        np.asarray(dense["grids"]),
                        valid=gen["valid"].reshape(-1),
                        features=gen["features"], cls_codes=gen["cls_codes"],
                    )
            elif "grids" in box:  # fused single-dispatch dense-grid path
                meshes = self.generator.meshes_from_grids(
                    box["grids"], valid=gen["valid"].reshape(-1),
                    features=gen["features"], cls_codes=gen["cls_codes"],
                )
            else:
                meshes = self.generator.generate_meshes(
                    gen["features"], gen["cls_codes"],
                    valid=gen["valid"].reshape(-1),
                )

        if gen and meshes is not None and self.fit_to_scan:
            parsed = fit_meshes_to_scan(
                parsed, meshes, gen["proposal_ids"], gen["valid"],
                point_clouds, self.dump_threshold,
            )

        voxel_size = float(
            point_clouds[0, :, 2].max() - point_clouds[0, :, 2].min()
        ) / 46.0

        mesh_pairs = gt_mesh_pairs = None
        if self.evaluate_mesh_mAP and meshes is not None:
            mesh_pairs = self._voxelize_meshes(
                meshes, parsed, gen, voxel_size
            )
            gt_mesh_pairs = self._voxelize_gt_meshes(batch, voxel_size)

        ec = self.cfg.eval_config
        batch_pred = assembly_pred_map_cls(
            parsed, self.dataset_config,
            conf_thresh=ec["conf_thresh"],
            per_class_proposal=ec["per_class_proposal"],
            meshes=mesh_pairs,
            proposal_ids=gen.get("proposal_ids"),
        )
        parsed_gts = parse_groundtruths(batch, self.dataset_config)
        batch_gt = assembly_gt_map_cls(parsed_gts, meshes=gt_mesh_pairs)

        return {
            "losses": losses,
            "batch_pred_map_cls": batch_pred,
            "batch_gt_map_cls": batch_gt,
            "iou_stats": iou_stats,
            "meshes": meshes,
            "parsed": parsed,
            "gen": gen,
        }

    def _voxelize_meshes(self, meshes, parsed, gen, voxel_size):
        """Scene-frame voxelization of predicted meshes (the reference
        places each canonical mesh into its box before voxelizing —
        `ap_helper.py:429-446` via fit_shapenet_obj_to_votenet_box)."""
        from .ap_helper import corners_from_params  # noqa: F401 (doc link)

        B, G, _ = gen["proposal_ids"].shape
        out = [[None] * G for _ in range(B)]

        def job(i, g):
            mesh = meshes[i * G + g]
            if len(mesh.vertices) == 0:
                return i, g, None
            j = int(gen["proposal_ids"][i, g, 0])
            placed = place_mesh_in_box(
                mesh, parsed["pred_corners_3d_upright_camera"][i, j]
            )
            return i, g, voxelize_mesh_pair(
                placed.vertices, placed.faces, voxel_size
            )

        jobs = [
            (i, g) for i in range(B) for g in range(G)
            if gen["valid"][i, g]
        ]
        for i, g, pair in self.voxel_pool.map(lambda a: job(*a), jobs):
            out[i][g] = pair
        # assembly looks meshes up by position in proposal_ids (mesh_for)
        return out

    def _voxelize_gt_meshes(self, batch, voxel_size):
        """GT meshes for mesh-mAP come from the simplified watertight
        ShapeNet models placed in the GT boxes (`ap_helper.py:371-401`);
        requires `shapenet_path` with `watertight_scaled_simplified`."""
        from ..meshing.mesh import TriMesh

        sp = self.cfg.config["data"].get("shapenet_path")
        if not sp or "shapenet_catids" not in batch:
            return None
        corners = parse_groundtruths(batch, self.dataset_config)[
            "gt_corners_3d_upright_camera"
        ]
        out = []
        for i, (catids, sids) in enumerate(
            zip(batch["shapenet_catids"], batch["shapenet_ids"])
        ):
            row = []
            for j, (cat, sid) in enumerate(zip(catids, sids)):
                path = os.path.join(
                    sp, "watertight_scaled_simplified", cat, sid + ".off"
                )
                if not os.path.exists(path):
                    row.append(None)
                    continue
                mesh = place_mesh_in_box(TriMesh.load(path), corners[i, j])
                row.append(
                    voxelize_mesh_pair(mesh.vertices, mesh.faces, voxel_size)
                )
            out.append(row)
        return out

    # -------------------------------------------------------------- dumps
    def visualize_step(self, out: dict, batch: dict, scene_dir: str):
        """Per-scene artifact dumps (`models/iscnet/testing.py:71-214`):
        input cloud, seeds/votes-free compact set — scene pc, NMS boxes,
        per-proposal placed meshes, and pred/gt (cls, box, score) txt."""
        import os

        from ..meshing.mesh import write_ply
        from ..utils.visualization import write_oriented_bbox_ply

        os.makedirs(scene_dir, exist_ok=True)
        pc = np.asarray(batch["point_clouds"])[0, :, :3]
        write_ply(os.path.join(scene_dir, "000000_pc.ply"), pc,
                  np.zeros((0, 3), np.int32))

        parsed, gen = out["parsed"], out.get("gen") or {}
        from .box_util import flip_axis_to_depth

        keep = np.nonzero(
            parsed["pred_mask"][0]
            & (parsed["obj_prob"][0] > self.cfg.eval_config["conf_thresh"])
        )[0]
        if len(keep):
            corners = flip_axis_to_depth(
                parsed["pred_corners_3d_upright_camera"][0, keep]
            )
            write_oriented_bbox_ply(
                os.path.join(scene_dir, "000000_pred_confident_nms_bbox.ply"),
                corners,
            )
        if gen and out["meshes"] is not None:
            G = gen["proposal_ids"].shape[1]
            for g in range(G):
                if not gen["valid"][0, g]:
                    continue
                j = int(gen["proposal_ids"][0, g, 0])
                mesh = out["meshes"][g]
                if len(mesh.vertices):
                    place_mesh_in_box(
                        mesh, parsed["pred_corners_3d_upright_camera"][0, j]
                    ).export(
                        os.path.join(scene_dir, f"proposal_{j}_mesh.ply")
                    )
        # interactive WebGL inspector (VTK-window equivalent,
        # `utils/scannet/visualization/vis_prediction.py`): scene points +
        # placed completion meshes + confident NMS boxes, class-colored.
        try:
            from ..config.scannet import (
                SHAPENETCLASSES,
                ScanNet_OBJ_CLASS_IDS,
            )
            from ..utils.scene_viz import (
                SceneRender,
                corners_to_center_vectors,
            )

            # one instance per confident NMS proposal: box + (optional)
            # placed completion mesh, both class-colored by pred_sem_cls
            mesh_by_pid = {}
            if gen and out["meshes"] is not None:
                G = gen["proposal_ids"].shape[1]
                for g in range(G):
                    if not gen["valid"][0, g]:
                        continue
                    j = int(gen["proposal_ids"][0, g, 0])
                    mesh = out["meshes"][g]
                    if len(mesh.vertices):
                        mesh_by_pid[j] = mesh
            centers, vectors, cls_ids, placed = [], [], [], []
            for k, j in enumerate(keep):
                c, vec = corners_to_center_vectors(corners[k])
                centers.append(c)
                vectors.append(vec)
                cls_ids.append(int(parsed["pred_sem_cls"][0, j]))
                if j in mesh_by_pid:
                    m = place_mesh_in_box(
                        mesh_by_pid[j],
                        parsed["pred_corners_3d_upright_camera"][0, j],
                    )
                    mv = flip_axis_to_depth(np.asarray(m.vertices))
                    placed.append((mv, np.asarray(m.faces)))
                else:
                    placed.append((np.zeros((0, 3)), np.zeros((0, 3),
                                                              np.int64)))
            SceneRender(
                pc, meshes=placed, centers=centers, vectors=vectors,
                class_ids=cls_ids,
            ).export_html(
                os.path.join(scene_dir, "scene.html"),
                title=os.path.basename(scene_dir),
                class_names=[SHAPENETCLASSES[c]
                             for c in ScanNet_OBJ_CLASS_IDS],
            )
        except Exception as e:  # viz must never fail the eval run
            self.log(f"[tester] scene.html export failed: {e}")

        with open(os.path.join(scene_dir, "pred_map_cls.txt"), "w") as f:
            for item in out["batch_pred_map_cls"][0]:
                f.write(f"{item[0]} {item[-1]} "
                        + " ".join(map(str, np.asarray(item[1]).ravel()))
                        + "\n")
        with open(os.path.join(scene_dir, "gt_map_cls.txt"), "w") as f:
            for item in out["batch_gt_map_cls"][0]:
                f.write(f"{item[0]} "
                        + " ".join(map(str, np.asarray(item[1]).ravel()))
                        + "\n")

    # ----------------------------------------------------------------- run
    def run(self, loader, ap_iou_thresholds=(0.5,), max_scenes=None,
            dump_dir=None):
        """Full evaluation pass (`test_epoch.py:44-68`)."""
        calculators = {
            t: APCalculator(
                t, self.dataset_config.class2type,
                mesh_iou_func=mesh_iou if self.evaluate_mesh_mAP else None,
            )
            for t in ap_iou_thresholds
        }
        cls_iou_stats = {}
        n = 0
        # depth-1 scene pipeline: scene i+1's device program + transfer
        # runs while scene i extracts meshes on the host (the reference's
        # loop is fully serial)
        pending = None
        it = iter(loader)
        done = False
        while not done:
            nxt = None
            if max_scenes is None or n + (pending is not None) < max_scenes:
                try:
                    nxt = self.dispatch_step(next(it))
                except StopIteration:
                    pass
            if pending is None:
                pending, done = nxt, nxt is None
                continue
            out = self.consume_step(pending)
            batch = pending["batch"]
            pending, done = nxt, nxt is None
            for calc in calculators.values():
                calc.step(out["batch_pred_map_cls"], out["batch_gt_map_cls"])
            if out["iou_stats"] is not None:
                for c, i in zip(out["iou_stats"]["cls"],
                                out["iou_stats"]["iou"]):
                    cls_iou_stats.setdefault(int(c), []).append(float(i))
            if dump_dir is not None:
                scan_idx = int(np.asarray(batch.get("scan_idx", [n]))[0])
                self.visualize_step(
                    out, batch,
                    os.path.join(dump_dir, f"scene_{scan_idx:05d}"),
                )
            n += 1
            if n % 10 == 0:
                self.log(f"evaluated {n} scenes")
            if max_scenes is not None and n >= max_scenes:
                break

        metrics = {}
        for t, calc in calculators.items():
            for k, v in calc.compute_metrics().items():
                metrics[f"{k} @{t}"] = v
        for c, vals in sorted(cls_iou_stats.items()):
            name = self.dataset_config.class2type.get(c, str(c))
            metrics[f"{name} voxel IoU"] = float(np.mean(vals))
        return metrics


def place_mesh_in_box(mesh, box_corners_cam: np.ndarray):
    """Place a canonical ([-0.55, 0.55]^3-ish) mesh into a camera-frame
    corner box in the depth/scan frame
    (`ap_helper.py:404-426` fit_shapenet_obj_to_votenet_box)."""
    from .box_util import flip_axis_to_depth

    c = flip_axis_to_depth(np.asarray(box_corners_cam))
    centroid = (c.max(0) + c.min(0)) / 2.0
    forward = c[1] - c[2]
    left = c[0] - c[1]
    up = c[6] - c[2]
    orientation = np.arctan2(forward[1], forward[0])
    sizes = np.linalg.norm(np.stack([forward, left, up]), axis=1)

    from .refit import TRANSFORM_SHAPENET

    out = mesh.copy()
    v = np.asarray(out.vertices)
    if len(v) == 0:
        return out
    v = v - (v.max(0) + v.min(0)) / 2.0
    v = v @ TRANSFORM_SHAPENET.T
    extent = v.max(0) - v.min(0)
    v = v / np.where(extent > 0, extent, 1.0) * sizes
    cs, sn = np.cos(orientation), np.sin(orientation)
    R = np.array([[cs, sn, 0], [-sn, cs, 0], [0, 0, 1]])
    out.vertices = v @ R + centroid
    return out
