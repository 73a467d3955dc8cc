"""Loss library — pure jnp functions, fully on-device.

Semantic rebuild of `models/loss.py` (DetectionLoss with vote / objectness /
box / semantic-cls terms, ONet_Loss) including every weight constant:
NEAR=0.3 / FAR=0.6 thresholds, objectness class weights [0.2, 0.8],
box term weights (0.1 heading-cls, 0.1 size-cls), total = (...)*10
(`loss.py:248-251`), ONet total = w * (completion + 100*mask)
(`loss.py:298-306`).

Deliberate parity notes: GT boxes are padded to MAX_NUM_OBJ with zeros and
— exactly as in the reference — padded centers DO participate in the
objectness nearest-center assignment (`loss.py:107-116` uses the full
center_label), while centroid_reg_loss2 masks by box_label_mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.nn_distance import huber_loss, nn_distance

FAR_THRESHOLD = 0.6
NEAR_THRESHOLD = 0.3
GT_VOTE_FACTOR = 3
OBJECTNESS_CLS_WEIGHTS = (0.2, 0.8)


def _cross_entropy(logits, labels, weights=None):
    """Per-element CE like torch CrossEntropyLoss(reduction='none').

    logits (..., C), labels (...,) int -> (...,). With `weights` (C,), the
    per-element loss is scaled by weights[label] (torch semantics; the
    normalisation by summed weights only matters for reduction='mean',
    which the reference does not use here).
    """
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)[
        ..., 0
    ]
    loss = -ll
    if weights is not None:
        w = jnp.asarray(weights)[labels.astype(jnp.int32)]
        loss = loss * w
    return loss


def compute_vote_loss(est, gt):
    """`loss.py:41-88`."""
    B, num_seed, _ = est["seed_xyz"].shape
    vote_xyz = est["vote_xyz"]  # (B, ns*vf, 3)
    seed_inds = est["seed_inds"].astype(jnp.int32)

    seed_gt_votes_mask = jnp.take_along_axis(
        gt["vote_label_mask"], seed_inds, axis=1
    )  # (B, ns)
    seed_gt_votes = jnp.take_along_axis(
        gt["vote_label"], seed_inds[..., None], axis=1
    )  # (B, ns, 9)
    seed_gt_votes = seed_gt_votes + jnp.tile(est["seed_xyz"], (1, 1, 3))

    vf = vote_xyz.shape[1] // num_seed
    vote_r = vote_xyz.reshape(B * num_seed, vf, 3)
    gt_r = seed_gt_votes.reshape(B * num_seed, GT_VOTE_FACTOR, 3)
    _, _, dist2, _ = nn_distance(vote_r, gt_r, l1=True)
    votes_dist = jnp.min(dist2, axis=1).reshape(B, num_seed)
    mask = seed_gt_votes_mask.astype(jnp.float32)
    return jnp.sum(votes_dist * mask) / (jnp.sum(mask) + 1e-6)


def compute_objectness_loss(est, gt):
    """`loss.py:90-129`. Returns (loss, objectness_label, objectness_mask,
    object_assignment)."""
    aggregated_vote_xyz = est["aggregated_vote_xyz"]
    gt_center = gt["center_label"][:, :, 0:3]
    dist1, ind1, _, _ = nn_distance(aggregated_vote_xyz, gt_center)
    euclidean_dist1 = jnp.sqrt(dist1 + 1e-6)
    objectness_label = (euclidean_dist1 < NEAR_THRESHOLD).astype(jnp.int32)
    objectness_mask = (
        (euclidean_dist1 < NEAR_THRESHOLD) | (euclidean_dist1 > FAR_THRESHOLD)
    ).astype(jnp.float32)
    loss = _cross_entropy(
        est["objectness_scores"], objectness_label, OBJECTNESS_CLS_WEIGHTS
    )
    loss = jnp.sum(loss * objectness_mask) / (jnp.sum(objectness_mask) + 1e-6)
    return loss, objectness_label, objectness_mask, ind1


def compute_box_and_sem_cls_loss(est, gt, object_assignment, objectness_label,
                                 mean_size_arr, num_heading_bin,
                                 num_size_cluster):
    """`loss.py:131-202`."""
    oa = object_assignment.astype(jnp.int32)
    obj_w = objectness_label.astype(jnp.float32)
    denom = jnp.sum(obj_w) + 1e-6

    # center (bidirectional chamfer between proposal and gt centers)
    dist1, _, dist2, _ = nn_distance(est["center"], gt["center_label"][:, :, 0:3])
    box_mask = gt["box_label_mask"].astype(jnp.float32)
    center_loss = jnp.sum(dist1 * obj_w) / denom + jnp.sum(dist2 * box_mask) / (
        jnp.sum(box_mask) + 1e-6
    )

    # heading
    heading_class_label = jnp.take_along_axis(
        gt["heading_class_label"].astype(jnp.int32), oa, axis=1
    )
    heading_class_loss = (
        jnp.sum(_cross_entropy(est["heading_scores"], heading_class_label) * obj_w)
        / denom
    )
    heading_residual_label = jnp.take_along_axis(
        gt["heading_residual_label"], oa, axis=1
    )
    hr_norm_label = heading_residual_label / (jnp.pi / num_heading_bin)
    h_onehot = jax.nn.one_hot(heading_class_label, num_heading_bin)
    hr_pred = jnp.sum(est["heading_residuals_normalized"] * h_onehot, axis=-1)
    heading_reg_loss = (
        jnp.sum(huber_loss(hr_pred - hr_norm_label, delta=1.0) * obj_w) / denom
    )

    # size
    size_class_label = jnp.take_along_axis(
        gt["size_class_label"].astype(jnp.int32), oa, axis=1
    )
    size_class_loss = (
        jnp.sum(_cross_entropy(est["size_scores"], size_class_label) * obj_w)
        / denom
    )
    size_residual_label = jnp.take_along_axis(
        gt["size_residual_label"], oa[..., None], axis=1
    )  # (B, K, 3)
    s_onehot = jax.nn.one_hot(size_class_label, num_size_cluster)  # (B, K, NS)
    sr_pred = jnp.sum(
        est["size_residuals_normalized"] * s_onehot[..., None], axis=2
    )  # (B, K, 3)
    mean_sizes = jnp.asarray(mean_size_arr, dtype=jnp.float32)  # (NS, 3)
    mean_size_label = jnp.einsum("bks,sc->bkc", s_onehot, mean_sizes)
    sr_norm_label = size_residual_label / mean_size_label
    size_reg_loss = (
        jnp.sum(
            jnp.mean(huber_loss(sr_pred - sr_norm_label, delta=1.0), axis=-1)
            * obj_w
        )
        / denom
    )

    # semantic class
    sem_cls_label = jnp.take_along_axis(
        gt["sem_cls_label"].astype(jnp.int32), oa, axis=1
    )
    sem_cls_loss = (
        jnp.sum(_cross_entropy(est["sem_cls_scores"], sem_cls_label) * obj_w)
        / denom
    )
    return (
        center_loss,
        heading_class_loss,
        heading_reg_loss,
        size_class_loss,
        size_reg_loss,
        sem_cls_loss,
    )


def detection_loss(est, gt, dataset_config):
    """`loss.py:205-271` DetectionLoss.__call__. Returns a dict of scalars
    with 'total' being the differentiable term."""
    vote_loss = compute_vote_loss(est, gt)
    objectness_loss, objectness_label, objectness_mask, object_assignment = (
        compute_objectness_loss(est, gt)
    )
    total_num_proposal = objectness_label.shape[0] * objectness_label.shape[1]
    pos_ratio = jnp.sum(objectness_label.astype(jnp.float32)) / total_num_proposal
    neg_ratio = jnp.sum(objectness_mask) / total_num_proposal - pos_ratio

    (center_loss, heading_cls_loss, heading_reg_loss, size_cls_loss,
     size_reg_loss, sem_cls_loss) = compute_box_and_sem_cls_loss(
        est, gt, object_assignment, objectness_label,
        dataset_config.mean_size_arr,
        dataset_config.num_heading_bin,
        dataset_config.num_size_cluster,
    )
    box_loss = (
        center_loss
        + 0.1 * heading_cls_loss
        + heading_reg_loss
        + 0.1 * size_cls_loss
        + size_reg_loss
    )
    loss = (vote_loss + 0.5 * objectness_loss + box_loss + 0.1 * sem_cls_loss) * 10.0

    obj_pred = jnp.argmax(est["objectness_scores"], axis=2)
    obj_acc = jnp.sum(
        (obj_pred == objectness_label).astype(jnp.float32) * objectness_mask
    ) / (jnp.sum(objectness_mask) + 1e-6)

    return {
        "total": loss,
        "vote_loss": vote_loss,
        "objectness_loss": objectness_loss,
        "box_loss": box_loss,
        "sem_cls_loss": sem_cls_loss,
        "pos_ratio": pos_ratio,
        "neg_ratio": neg_ratio,
        "center_loss": center_loss,
        "heading_cls_loss": heading_cls_loss,
        "heading_reg_loss": heading_reg_loss,
        "size_cls_loss": size_cls_loss,
        "size_reg_loss": size_reg_loss,
        "obj_acc": obj_acc,
    }


def compute_objectness_loss_boxnet(est, gt):
    """`loss.py:309-348`: BoxNet-style objectness — labels come from the
    seed points' GT vote mask (gathered through seed_inds then
    aggregated_vote_inds), no NEAR/FAR ignore zone."""
    dist1, ind1, _, _ = nn_distance(
        est["aggregated_vote_xyz"], gt["center_label"][:, :, 0:3]
    )
    seed_inds = est["seed_inds"].astype(jnp.int32)
    seed_labels = jnp.take_along_axis(gt["vote_label_mask"], seed_inds, axis=1)
    objectness_label = jnp.take_along_axis(
        seed_labels, est["aggregated_vote_inds"].astype(jnp.int32), axis=1
    ).astype(jnp.int32)
    objectness_mask = jnp.ones_like(objectness_label, dtype=jnp.float32)
    loss = _cross_entropy(
        est["objectness_scores"], objectness_label, OBJECTNESS_CLS_WEIGHTS
    )
    loss = jnp.sum(loss * objectness_mask) / (jnp.sum(objectness_mask) + 1e-6)
    return loss, objectness_label, objectness_mask, ind1


def boxnet_detection_loss(est, gt, dataset_config):
    """`loss.py:350-413` BoxNetDetectionLoss: DetectionLoss with the
    seed-label objectness and no vote loss."""
    objectness_loss, objectness_label, objectness_mask, object_assignment = (
        compute_objectness_loss_boxnet(est, gt)
    )
    total_num_proposal = objectness_label.shape[0] * objectness_label.shape[1]
    pos_ratio = jnp.sum(objectness_label.astype(jnp.float32)) / total_num_proposal
    neg_ratio = jnp.sum(objectness_mask) / total_num_proposal - pos_ratio

    (center_loss, heading_cls_loss, heading_reg_loss, size_cls_loss,
     size_reg_loss, sem_cls_loss) = compute_box_and_sem_cls_loss(
        est, gt, object_assignment, objectness_label,
        dataset_config.mean_size_arr,
        dataset_config.num_heading_bin,
        dataset_config.num_size_cluster,
    )
    box_loss = (
        center_loss + 0.1 * heading_cls_loss + heading_reg_loss
        + 0.1 * size_cls_loss + size_reg_loss
    )
    loss = (0.5 * objectness_loss + box_loss + 0.1 * sem_cls_loss) * 10.0
    obj_pred = jnp.argmax(est["objectness_scores"], axis=2)
    obj_acc = jnp.sum(
        (obj_pred == objectness_label).astype(jnp.float32) * objectness_mask
    ) / (jnp.sum(objectness_mask) + 1e-6)
    return {
        "total": loss,
        "objectness_loss": objectness_loss,
        "box_loss": box_loss,
        "sem_cls_loss": sem_cls_loss,
        "pos_ratio": pos_ratio,
        "neg_ratio": neg_ratio,
        "center_loss": center_loss,
        "heading_cls_loss": heading_cls_loss,
        "heading_reg_loss": heading_reg_loss,
        "size_cls_loss": size_cls_loss,
        "size_reg_loss": size_reg_loss,
        "obj_acc": obj_acc,
    }


def onet_loss(completion_loss, mask_loss, weight=1.0):
    """`loss.py:298-306` ONet_Loss."""
    total = weight * (completion_loss + 100.0 * mask_loss)
    return {
        "total_loss": total,
        "completion_loss": completion_loss,
        "mask_loss": mask_loss,
    }


def chamfer_loss(set1, set2, weight=1.0):
    """`loss.py:274-286` ChamferDist."""
    from ..ops.chamfer import chamfer_distance

    d1, d2 = chamfer_distance(set1, set2)
    return weight * (jnp.mean(d1) + jnp.mean(d2))
