"""ISCNet — the composite detection + instance-completion model.

Semantic rebuild of `models/iscnet/modules/network.py` as one flax module
whose train forward (`network.py:305-385`) and detection/generation forward
(`network.py:56-180`) are single jittable programs:

- backbone -> voting (L2-normalised residual features, `network.py:322-324`)
  -> proposal head,
- completion phase: proposal selection (`get_proposal_id`, `network.py:387`)
  implemented as a fixed-shape on-device ranking (objectness-sorted,
  unique-GT-first — exactly np.unique(return_index) + setdiff1d order),
- skip propagation and ONet loss over the selected proposals,
- generation path: on-device box decoding + class-aware 3D NMS
  (`ap_helper.py:131-264` without the Python proposal loops).

Variable-length structures (NMS survivors, proposals per scene) are kept
static-shape with validity masks throughout.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import (
    class2angle,
    class2size,
    corners_to_aabb,
    flip_axis_to_camera,
    get_3d_box_batch,
    nms_3d,
)
from ..ops.nn_distance import nn_distance
from .backbone import Pointnet2Backbone
from .losses import detection_loss, onet_loss
from .occnet import ONet
from .proposal import ProposalModule
from .skip_propagation import SkipPropagation
from .voting import VotingModule


def select_completion_proposals(objectness_probs, center, gt_center,
                                box_label_mask, sem_cls_label, limit):
    """On-device `get_proposal_id(..., mode='objectness')`
    (`network.py:387-436`): rank proposals by objectness, take the first
    proposal per distinct assigned GT box first (ordered by GT id — the
    np.unique(return_index) order), then remaining proposals in objectness
    order, truncated to `limit`.

    Returns (B, limit, 3) int32 [proposal_id, gt_box_id, cls_id].
    """
    B, K = objectness_probs.shape
    M = gt_center.shape[1]

    # proposal -> nearest VALID gt box
    d = jnp.sum((center[:, :, None, :] - gt_center[:, None, :, :]) ** 2, axis=-1)
    d = jnp.where(box_label_mask[:, None, :] > 0, d, jnp.inf)
    object_assignment = jnp.argmin(d, axis=-1).astype(jnp.int32)  # (B, K)

    def per_scene(probs, assign, sem_cls):
        order = jnp.argsort(-probs).astype(jnp.int32)  # (K,) objectness desc
        sorted_gt = assign[order]  # (K,)
        minidx = jnp.full((M,), K, dtype=jnp.int32).at[sorted_gt].min(
            jnp.arange(K, dtype=jnp.int32)
        )
        is_first = minidx[sorted_gt] == jnp.arange(K, dtype=jnp.int32)
        # group A: first occurrence of each GT, keyed by GT id (< M);
        # group B: the rest, keyed by M + position (objectness order)
        key = jnp.where(is_first, sorted_gt, M + jnp.arange(K, dtype=jnp.int32))
        gt_ids = jnp.argsort(key)[:limit]
        sample_ids = order[gt_ids]
        gt_box_ids = assign[sample_ids]
        cls_ids = sem_cls[gt_box_ids].astype(jnp.int32)
        return jnp.stack([sample_ids, gt_box_ids, cls_ids], axis=-1)

    return jax.vmap(per_scene)(objectness_probs, object_assignment, sem_cls_label)


class ISCNet(nn.Module):
    """Composite model. `phase` selects the active submodules
    (`network.py:27-33`)."""

    num_class: int = 8
    num_heading_bin: int = 12
    num_size_cluster: int = 8
    mean_size_arr: Any = None  # np.ndarray (num_size_cluster, 3)
    num_proposal: int = 256
    vote_factor: int = 1
    cluster_sampling: str = "seed_fps"
    input_feature_dim: int = 1  # detection input features (height)
    completion_feature_dim: int = 1
    phase: str = "completion"  # 'detection' | 'completion'
    skip_propagate: bool = True
    c_dim: int = 512
    hidden_dim: int = 512
    z_dim: int = 32
    threshold: float = 0.5
    use_cls_for_completion: bool = False
    completion_limit: int = 10  # completion_limit_in_train
    generate_limit: int = 64  # max proposals completed at test time
    frozen: tuple = ()  # submodule names held in eval mode (reference
    # freezes params via requires_grad AND switches the module to eval —
    # `models/network.py:57-79`; the gradient mask lives in the trainer)
    bn_axis_name: str | None = None
    fps_impl: str | None = None
    decoder_dtype: str | None = None  # "bfloat16": MXU fast decode path
    mlp_dtype: str | None = None  # "bfloat16": bf16 operand/activation
    # chains in the backbone/voting/aggregation shared MLPs (f32
    # accumulate + f32 BN stats + f32 geometry heads). Train-throughput
    # mode (`data.mlp_bf16` in configs); default f32 for parity.

    def setup(self):
        kw = dict(bn_axis_name=self.bn_axis_name)
        self.backbone = Pointnet2Backbone(
            input_feature_dim=self.input_feature_dim,
            fps_impl=self.fps_impl, mlp_dtype=self.mlp_dtype, **kw,
        )
        self.voting = VotingModule(vote_factor=self.vote_factor,
                                   mlp_dtype=self.mlp_dtype, **kw)
        self.detection = ProposalModule(
            num_class=self.num_class,
            num_heading_bin=self.num_heading_bin,
            num_size_cluster=self.num_size_cluster,
            num_proposal=self.num_proposal,
            sampling=self.cluster_sampling,
            fps_impl=self.fps_impl,
            mlp_dtype=self.mlp_dtype,
            **kw,
        )
        if self.phase == "completion":
            if self.skip_propagate:
                self.skip_propagation = SkipPropagation(
                    c_dim=self.c_dim,
                    hidden_dim=self.hidden_dim,
                    input_feature_dim=self.completion_feature_dim,
                    mlp_dtype=self.mlp_dtype,
                    **kw,
                )
            self.completion = ONet(
                z_dim=self.z_dim,
                c_dim=self.c_dim,
                threshold=self.threshold,
                use_cls_for_completion=self.use_cls_for_completion,
                num_class=self.num_class,
                decoder_dtype=self.decoder_dtype,
                **kw,
            )

    # ------------------------------------------------------------- shared
    def _train_flag(self, name: str, train: bool) -> bool:
        return train and name not in self.frozen

    def detect(self, point_clouds, train: bool, bn_momentum=None, rng=None):
        """backbone -> voting -> proposal (`network.py:314-331`)."""
        end_points = self.backbone(
            point_clouds, self._train_flag("backbone", train), bn_momentum
        )
        xyz = end_points["fp2_xyz"]
        features = end_points["fp2_features"]
        end_points["seed_inds"] = end_points["fp2_inds"]
        end_points["seed_xyz"] = xyz
        end_points["seed_features"] = features

        xyz, features = self.voting(
            xyz, features, self._train_flag("voting", train), bn_momentum
        )
        # L2-normalize (`network.py:322-324`); the reference divides by the
        # raw norm — guard against feature collapse (norm -> 0 would NaN
        # the whole graph under aggressive joint training)
        norm = jnp.linalg.norm(features, axis=-1, keepdims=True)
        features = features / jnp.maximum(norm, 1e-8)
        end_points["vote_xyz"] = xyz
        end_points["vote_features"] = features

        end_points, proposal_features = self.detection(
            xyz, features, end_points,
            self._train_flag("detection", train), bn_momentum, rng=rng,
        )
        return end_points, proposal_features

    def _heading_angles(self, end_points):
        pred_heading_class = jnp.argmax(end_points["heading_scores"], axis=-1)
        hr = end_points["heading_residuals_normalized"] * (
            np.pi / self.num_heading_bin
        )
        pred_heading_residual = jnp.take_along_axis(
            hr, pred_heading_class[..., None], axis=-1
        )[..., 0]
        return class2angle(
            pred_heading_class, pred_heading_residual, self.num_heading_bin
        )

    def _complete(self, end_points, proposal_features, proposal_ids, data,
                  train, bn_momentum, rng):
        """Gather selected proposals, skip-propagate, ONet loss
        (`network.py:336-381`), with an optional (B, P) valid mask in
        proposal_ids[..., 3] position handled by the caller via
        `valid_mask`."""
        B, P, _ = proposal_ids.shape
        pids = proposal_ids[..., 0]

        sel_features = jnp.take_along_axis(
            proposal_features, pids[..., None], axis=1
        )  # (B, P, 128)
        pred_centers = jnp.take_along_axis(
            end_points["center"], pids[..., None], axis=1
        )
        heading_angles = jnp.take_along_axis(
            self._heading_angles(end_points), pids, axis=1
        )

        if self.skip_propagate:
            proposal_instance_labels = jnp.take_along_axis(
                data["object_instance_labels"], proposal_ids[..., 1], axis=1
            )
            object_input_features, mask_loss = self.skip_propagation(
                pred_centers,
                heading_angles,
                sel_features,
                data["point_clouds"],
                data.get("point_instance_labels"),
                proposal_instance_labels,
                self._train_flag("skip_propagation", train),
                bn_momentum,
            )  # (B, P, c_dim)
        else:
            object_input_features, mask_loss = sel_features, jnp.float32(0.0)

        # input/occ pairs for the assigned GT objects (`prepare_data`)
        gt_ids = proposal_ids[..., 1]
        input_points = jnp.take_along_axis(
            data["object_points"], gt_ids[..., None, None], axis=1
        )  # (B, P, T, 3)
        input_occ = jnp.take_along_axis(
            data["object_points_occ"], gt_ids[..., None], axis=1
        )  # (B, P, T)
        cls_codes = jax.nn.one_hot(proposal_ids[..., 2], self.num_class)

        feat_flat = object_input_features.reshape(B * P, -1)
        completion_loss, shape_example = self.completion.compute_loss(
            feat_flat,
            input_points.reshape(B * P, *input_points.shape[2:]),
            input_occ.reshape(B * P, -1),
            cls_codes.reshape(B * P, -1),
            rng,
            self._train_flag("completion", train),
            bn_momentum,
            export_shape=data.get("export_shape", False),
        )
        return object_input_features, completion_loss, mask_loss, shape_example

    # ------------------------------------------------------------- train
    def __call__(self, data, train: bool = True, bn_momentum=None, rng=None):
        """Training forward (`network.py:305-385`).

        data: dict with point_clouds and GT labels.
        Returns (end_points, completion_loss (2,), shape_example,
        proposal_ids).
        """
        if rng is None:
            rng = jax.random.PRNGKey(0)
        r_prop, r_z = jax.random.split(rng)
        end_points, proposal_features = self.detect(
            data["point_clouds"], train, bn_momentum, rng=r_prop
        )

        if self.phase == "completion":
            if "pinned_proposal_ids" in data:
                # test hook: bypass the objectness-driven selection so
                # skip propagation sees identical proposals regardless of
                # upstream ~1-ULP codegen differences (used by the
                # pinned-selection DP-equality test; the reference has no
                # equivalent because DataParallel never changes program
                # layout per replica count)
                proposal_ids = data["pinned_proposal_ids"]
            else:
                objectness_probs = jax.nn.softmax(
                    end_points["objectness_scores"], axis=-1
                )[..., 1]
                proposal_ids = select_completion_proposals(
                    objectness_probs,
                    end_points["center"],
                    data["center_label"][:, :, 0:3],
                    data["box_label_mask"],
                    data["sem_cls_label"],
                    self.completion_limit,
                )
            (_, completion_loss, mask_loss, shape_example) = self._complete(
                end_points, proposal_features, proposal_ids, data,
                train, bn_momentum, r_z,
            )
        else:
            proposal_ids = None
            completion_loss = jnp.float32(0.0)
            mask_loss = jnp.float32(0.0)
            shape_example = None

        losses = jnp.stack([completion_loss, mask_loss])
        return end_points, losses, shape_example, proposal_ids

    # ---------------------------------------------------------- generate
    def generate_detections(self, point_clouds, conf_thresh=0.05,
                            nms_iou=0.25, use_cls_nms=True,
                            remove_empty_box=False):
        """Eval-mode detection + on-device box decode + NMS.

        Returns (end_points, proposal_features, parsed) where parsed holds
        pred corners (camera frame), per-proposal class/prob and the NMS
        keep mask (the `eval_dict['pred_mask']`/`parsed_predictions`
        contract of `ap_helper.py:131-264`).
        """
        end_points, proposal_features = self.detect(point_clouds, False)
        parsed = self.parse_predictions(
            end_points, nms_iou, use_cls_nms,
            point_clouds=point_clouds, remove_empty_box=remove_empty_box,
        )
        return end_points, proposal_features, parsed

    def parse_predictions(self, end_points, nms_iou=0.25, use_cls_nms=True,
                          point_clouds=None, remove_empty_box=False):
        heading_angles = self._heading_angles(end_points)
        pred_size_class = jnp.argmax(end_points["size_scores"], axis=-1)
        mean_sizes = jnp.asarray(self.mean_size_arr, dtype=jnp.float32)
        size_residuals = end_points["size_residuals_normalized"] * mean_sizes[
            None, None, :, :
        ]
        pred_size_residual = jnp.take_along_axis(
            size_residuals, pred_size_class[..., None, None], axis=2
        )[:, :, 0, :]
        box_size = class2size(pred_size_class, pred_size_residual, mean_sizes)

        center_cam = flip_axis_to_camera(end_points["center"])
        corners_cam = get_3d_box_batch(box_size, -heading_angles, center_cam)

        obj_prob = jax.nn.softmax(end_points["objectness_scores"], axis=-1)[..., 1]
        sem_cls_probs = jax.nn.softmax(end_points["sem_cls_scores"], axis=-1)
        pred_sem_cls = jnp.argmax(end_points["sem_cls_scores"], axis=-1)

        valid = None
        if remove_empty_box and point_clouds is not None:
            # `ap_helper.py:140-152`: drop proposals whose box contains
            # fewer than 5 scene points. On-device OBB test,
            # chunked over proposals to bound the (chunk, N, 3) slab.
            B, K, _ = end_points["center"].shape
            centers = end_points["center"]  # depth frame
            c, s = jnp.cos(heading_angles), jnp.sin(heading_angles)

            def per_scene(pc_i, ctr_i, c_i, s_i, size_i):
                def count_chunk(ctr, cc, ss, size):
                    rel = pc_i[None, :, :3] - ctr[:, None, :]
                    lx = cc[:, None] * rel[..., 0] + ss[:, None] * rel[..., 1]
                    ly = -ss[:, None] * rel[..., 0] + cc[:, None] * rel[..., 1]
                    # exact box half-extents: the reference tests the
                    # unenlarged corner hull (`ap_helper.py:146-149`
                    # extract_pc_in_box3d on get_3d_box corners)
                    inside = (
                        (jnp.abs(lx) <= size[:, None, 0] * 0.5)
                        & (jnp.abs(ly) <= size[:, None, 1] * 0.5)
                        & (jnp.abs(rel[..., 2]) <= size[:, None, 2] * 0.5)
                    )
                    return jnp.sum(inside, axis=-1)

                Kc = 32
                parts = []
                for k0 in range(0, K, Kc):
                    parts.append(count_chunk(
                        ctr_i[k0 : k0 + Kc], c_i[k0 : k0 + Kc],
                        s_i[k0 : k0 + Kc], size_i[k0 : k0 + Kc],
                    ))
                return jnp.concatenate(parts)

            counts = jax.vmap(
                lambda pc_i, ctr_i, c_i, s_i, size_i: per_scene(
                    pc_i, ctr_i, c_i, s_i, size_i
                ), in_axes=(0, 0, 0, 0, 0),
            )(point_clouds[..., :3], centers, c, s, box_size)
            valid = counts >= 5

        aabb = corners_to_aabb(corners_cam)
        pred_mask = nms_3d(
            aabb,
            obj_prob,
            pred_sem_cls if use_cls_nms else None,
            nms_iou,
            valid=valid,
        )
        return {
            "pred_corners_3d_upright_camera": corners_cam,
            "sem_cls_probs": sem_cls_probs,
            "obj_prob": obj_prob,
            "pred_sem_cls": pred_sem_cls,
            "pred_mask": pred_mask,
            "heading_angles": heading_angles,
            "box_size": box_size,
        }

    def generate_completion(self, end_points, proposal_features, parsed, data,
                            dump_threshold=0.5, rng=None):
        """Select NMS survivors above threshold (static top-`generate_limit`
        by masked objectness), skip-propagate, and return per-proposal
        conditioning codes for mesh generation (`network.py:97-160`).

        Returns dict with proposal_ids (B, G, 3), valid (B, G),
        features (B*G, c_dim), cls_codes (B*G, num_class),
        completion_loss, mask iou inputs.
        """
        if rng is None:
            rng = jax.random.PRNGKey(0)
        B, K = parsed["obj_prob"].shape
        G = min(self.generate_limit, K)
        eligible = parsed["pred_mask"] & (parsed["obj_prob"] > dump_threshold)
        score = jnp.where(eligible, parsed["obj_prob"], -1.0)
        top_scores, top_ids = jax.lax.top_k(score, G)  # (B, G)
        valid = top_scores > 0.0

        # GT assignment for the selected proposals (for loss / IoU stats;
        # in demo mode gt fields may be absent -> zeros)
        if "center_label" in data:
            d = jnp.sum(
                (end_points["center"][:, :, None, :] -
                 data["center_label"][:, None, :, 0:3]) ** 2, axis=-1,
            )
            d = jnp.where(data["box_label_mask"][:, None, :] > 0, d, jnp.inf)
            assign = jnp.argmin(d, axis=-1).astype(jnp.int32)
            gt_ids = jnp.take_along_axis(assign, top_ids, axis=1)
            cls_ids = jnp.take_along_axis(
                data["sem_cls_label"].astype(jnp.int32), gt_ids, axis=1
            )
        else:
            gt_ids = jnp.zeros_like(top_ids)
            cls_ids = jnp.take_along_axis(
                parsed["pred_sem_cls"].astype(jnp.int32), top_ids, axis=1
            )
        proposal_ids = jnp.stack([top_ids, gt_ids, cls_ids], axis=-1)

        sel_features = jnp.take_along_axis(
            proposal_features, top_ids[..., None], axis=1
        )
        pred_centers = jnp.take_along_axis(
            end_points["center"], top_ids[..., None], axis=1
        )
        heading_angles = jnp.take_along_axis(
            self._heading_angles(end_points), top_ids, axis=1
        )

        mask_loss = jnp.float32(0.0)
        if self.skip_propagate:
            if "point_instance_labels" in data:
                # test mode: the reference runs the SUPERVISED skip
                # propagation at generate time too, producing a mask loss
                # (`network.py:124-128`)
                proposal_instance_labels = jnp.take_along_axis(
                    data["object_instance_labels"], gt_ids, axis=1
                )
                object_input_features, mask_loss = self.skip_propagation(
                    pred_centers, heading_angles, sel_features,
                    data["point_clouds"], data["point_instance_labels"],
                    proposal_instance_labels, False, None,
                    slot_mask=valid,
                )
            else:  # demo mode: argmax mask, no supervision
                object_input_features = self.skip_propagation.generate(
                    pred_centers, heading_angles, sel_features,
                    data["point_clouds"],
                )
        else:
            object_input_features = sel_features

        # cls codes from predicted semantics (argmax one-hot,
        # `network.py:138-141`)
        sel_sem_scores = jnp.take_along_axis(
            end_points["sem_cls_scores"], top_ids[..., None], axis=1
        )
        cls_codes = (
            sel_sem_scores
            >= jnp.max(sel_sem_scores, axis=-1, keepdims=True)
        ).astype(jnp.float32)

        return {
            "proposal_ids": proposal_ids,
            "valid": valid,
            "features": object_input_features.reshape(B * G, -1),
            "cls_codes": cls_codes.reshape(B * G, -1),
            "centers": pred_centers,
            "heading_angles": heading_angles,
            "mask_loss": mask_loss,
        }

    def generate(self, data, nms_iou=0.25, use_cls_nms=True,
                 grid_sparse_budget=None, grid_iso=0.0,
                 dump_threshold=0.5, export_voxels=True,
                 remove_empty_box=False, decode_grid_res=None,
                 grid_padding=0.1, grid_rng=None, grid_dtype=None,
                 grid_impl=None):
        """Full test-time forward (`network.py:56-180` minus host-side mesh
        extraction): detection + on-device NMS, completion conditioning,
        eval completion loss on the GT-assigned occupancy pairs, and the
        16^3 shape voxels used for per-class voxel-IoU stats.

        decode_grid_res: when set (completion phase, dense-grid
        upsampling_steps=0 mode), the `resolution_0`^3 occupancy grid of
        every selected proposal is ALSO decoded inside this same traced
        program (`out["grids"]`, shape (B*G, nx, nx, nx)) — the whole
        test-protocol device work then runs in ONE dispatch, leaving only
        marching cubes on the host. The reference issues one decoder call
        per proposal per 100k-point chunk (`generator.py:68-74,123-143`).

        grid_dtype: optional narrow dtype (e.g. "float16") for the
        exported grids. Transfer-only quantization: decoder math stays
        f32; only the device->host logit grid shrinks (64 proposals x
        32^3 f32 is 8.4 MB/scene, the largest output). f16 moves
        marching-cubes vertex interpolation by O(1e-3) of a voxel (see
        tests/test_meshing.py f16-vs-f32 mesh bound).

        Returns dict with parsed, gen (incl. test-time mask_loss when
        instance labels are present, `network.py:124-128`),
        completion_loss, shape voxels.
        """
        end_points, proposal_features, parsed = self.generate_detections(
            data["point_clouds"], nms_iou=nms_iou, use_cls_nms=use_cls_nms,
            remove_empty_box=remove_empty_box,
        )
        out = {"end_points": end_points, "parsed": parsed}
        if self.phase != "completion":
            return out
        gen = self.generate_completion(
            end_points, proposal_features, parsed, data,
            dump_threshold=dump_threshold,
        )
        out["gen"] = gen
        if "object_points" in data:
            B, G, _ = gen["proposal_ids"].shape
            gt_ids = gen["proposal_ids"][..., 1]
            input_points = jnp.take_along_axis(
                data["object_points"], gt_ids[..., None, None], axis=1
            ).reshape(B * G, -1, 3)
            input_occ = jnp.take_along_axis(
                data["object_points_occ"], gt_ids[..., None], axis=1
            ).reshape(B * G, -1)
            completion_loss, voxels = self.completion.compute_loss(
                gen["features"], input_points, input_occ, gen["cls_codes"],
                None, False, export_shape=export_voxels,
                valid_mask=gen["valid"].reshape(B * G),
            )
            out["completion_loss"] = completion_loss
            if voxels is not None:
                # transfer as packed occupancy bits: the only consumer is
                # the voxel-IoU stat, which thresholds at 0.5
                # (`external/common.py:7-35`); 16^3 f32 -> 512 B/proposal
                # (32x less device->host traffic on the tunnel)
                B_, G_ = gen["proposal_ids"].shape[:2]
                out["shape_voxels_bits"] = jnp.packbits(
                    (voxels >= 0.5).reshape(B_ * G_, -1), axis=-1
                )
            else:
                out["shape_voxels_bits"] = None
        if decode_grid_res:
            from .occnet import make_3d_grid

            nx = int(decode_grid_res)
            box_size = 1.0 + grid_padding
            pts = box_size * make_3d_grid(
                (-0.5,) * 3, (0.5,) * 3, (nx,) * 3
            )
            Nb = gen["features"].shape[0]
            pts_b = jnp.broadcast_to(pts[None], (Nb, pts.shape[0], 3))
            logits = self.decode_occupancy(
                gen["features"], gen["cls_codes"], pts_b, rng=grid_rng,
                impl=grid_impl,
            )
            if grid_dtype is not None:
                # clip to the f16 finite range before narrowing: |logit| >
                # 65504 would overflow to inf and NaN the marching-cubes
                # vertex interpolation; sign/threshold is unaffected
                logits = jnp.clip(logits, -6e4, 6e4).astype(grid_dtype)
            grids = logits.reshape(Nb, nx, nx, nx)
            if grid_sparse_budget:
                # transfer-sparse form: one sign bit per lattice point +
                # the iso-neighborhood values (meshing/mise_device.py
                # sparsify_grids) — marching cubes needs nothing else,
                # and the dense f16 grids are the protocol's dominant
                # device->host payload (~4.2 MB/scene)
                from ..meshing.mise_device import sparsify_grids

                # grid_iso must equal the host extractor's logit
                # threshold (logit(data.threshold); 0.0 for the shipped
                # threshold=0.5)
                bits, vals, counts = sparsify_grids(
                    grids, float(grid_iso), int(grid_sparse_budget),
                    valid=gen["valid"].reshape(Nb),
                )
                out["grid_bits"] = bits
                out["grid_vals"] = vals
                out["grid_counts"] = counts
            else:
                out["grids"] = grids
        return out

    def decode_occupancy(self, features, cls_codes, points, rng=None,
                         impl=None):
        """Batched occupancy-logit evaluation for mesh extraction.

        features (Nb, c_dim), cls_codes (Nb, num_class), points (Nb, T, 3)
        -> logits (Nb, T). Eval mode; z is the prior mean, or a prior
        sample when `rng` is given (the `generation.use_sampling` option,
        `generator.py:100-104` sample_z from get_prior_z).

        impl="pallas" runs the decoder chain as the single fused VMEM-
        resident kernel (`ops/cbn_decoder.py`, bf16-operand matmuls ==
        decoder_dtype="bfloat16" numerics; 2.3x the unfused f32 decode).
        """
        import jax

        c = self.completion._cond(features, cls_codes)
        if rng is not None:
            z = jax.random.normal(
                rng, (c.shape[0], self.completion.z_dim)
            )
        else:
            z = jnp.zeros((c.shape[0], self.completion.z_dim))
        if impl == "pallas":
            return self.completion.decode_fused(points, z, c)
        return self.completion.decode(points, z, c, False)

    # ------------------------------------------------------------- loss
    def loss(self, est_data, gt_data, dataset_config, completion_weight=1.0):
        """`network.py:473-486`."""
        end_points, completion_losses = est_data[:2]
        total = detection_loss(end_points, gt_data, dataset_config)
        if self.phase == "completion":
            cl = onet_loss(
                completion_losses[0], completion_losses[1], completion_weight
            )
            total = {
                **total,
                "completion_loss": cl["completion_loss"],
                "mask_loss": cl["mask_loss"],
            }
            total["total"] = total["total"] + cl["total_loss"]
        return total
