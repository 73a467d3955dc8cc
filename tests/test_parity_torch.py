"""torch<->flax numerical parity: inject identical weights into the
reference's torch modules (CPU) and this framework's flax modules, feed
identical inputs, and assert output agreement.

This is the quality-parity evidence that the flax model computes the same
function as the reference network — module by module over every torch-native
piece (the CUDA-kernel pieces are covered separately by the oracle tests in
test_ops.py).

Reference counterparts, by test:
  vote_module.py:34-61, proposal_module.py:13-39+79-83, pointseg.py:7-177,
  layers.py (ResnetBlockFC/CBatchNorm1d/CResnetBlockConv1d/ResnetPointnet),
  encoder_latent.py:12-73, occ_decoder.py:110-122, occupancy_net.py:59-109,
  net_utils/nn_distance.py:34-61, models/loss.py:41-306,
  network.py:387-436 (get_proposal_id), net_utils/ap_helper.py:131-264.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from ref_torch import (
    bn_params,
    bn_stats,
    cbn_params,
    cresnet_block_params,
    dense_from_conv1d,
    dense_from_linear,
    install_reference,
    randomize_bn_stats,
    resnet_block_fc_params,
    t2j,
)

install_reference()

ATOL = 3e-5
RTOL = 2e-4


def allclose(a, b, atol=ATOL, rtol=RTOL):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol, rtol=rtol)


@pytest.fixture()
def gen():
    g = torch.Generator()
    g.manual_seed(0)
    return g


def trand(*shape, gen, scale=1.0):
    return torch.randn(*shape, generator=gen) * scale


class _FakeCfg:
    """Minimal cfg object satisfying the reference modules' constructor
    reads."""

    def __init__(self, config, dataset_config=None):
        self.config = config
        self.dataset_config = dataset_config

    def log_string(self, s):
        pass


class _DC:
    """dataset_config namespace with the real ScanNet constants."""

    def __init__(self):
        from rfdnet_tpu.config.scannet import ScannetConfig

        c = ScannetConfig()
        self.num_class = c.num_class
        self.num_heading_bin = c.num_heading_bin
        self.num_size_cluster = c.num_size_cluster
        self.mean_size_arr = c.mean_size_arr


# ===================================================================== voting
def test_voting_module_parity(gen):
    from models.iscnet.modules.vote_module import VotingModule as TorchVoting

    from rfdnet_tpu.models.voting import VotingModule

    cfg = _FakeCfg({"data": {"vote_factor": 1}})
    tm = TorchVoting(cfg)
    randomize_bn_stats(tm, gen)
    tm.eval()

    B, N = 2, 64
    seed_xyz = trand(B, N, 3, gen=gen)
    seed_feat = trand(B, 256, N, gen=gen)  # torch layout (B, C, N)

    with torch.no_grad():
        t_xyz, t_feat = tm(seed_xyz, seed_feat)

    params = {
        "conv1": dense_from_conv1d(tm.conv1),
        "conv2": dense_from_conv1d(tm.conv2),
        "conv3": dense_from_conv1d(tm.conv3),
    }
    stats = {}
    for i in (1, 2):
        p, s = bn_params(getattr(tm, f"bn{i}"))
        params[f"bn{i}"] = p
        stats[f"bn{i}"] = s

    jm = VotingModule(vote_factor=1)
    j_xyz, j_feat = jm.apply(
        {"params": params, "batch_stats": stats},
        t2j(seed_xyz),
        t2j(seed_feat.transpose(2, 1)),
        train=False,
    )
    allclose(j_xyz, t_xyz.numpy())
    allclose(j_feat, t_feat.transpose(2, 1).numpy())


# ============================================================= proposal head
def test_proposal_head_and_decode_scores_parity(gen):
    """The proposal head convs + decode_scores (`proposal_module.py:13-39,
    116-121`). The vote-aggregation SA layer is CUDA-only in the reference,
    so the head is driven directly with identical aggregated features."""
    from models.iscnet.modules.proposal_module import (
        ProposalModule as TorchProposal,
    )
    from models.iscnet.modules.proposal_module import decode_scores as t_decode

    from rfdnet_tpu.models.proposal import decode_scores as j_decode

    dc = _DC()
    cfg = _FakeCfg(
        {"data": {"num_target": 32, "cluster_sampling": "seed_fps"}}, dc
    )
    tm = TorchProposal(cfg)
    randomize_bn_stats(tm, gen)
    tm.eval()

    B, K = 2, 32
    features = trand(B, 128, K, gen=gen)
    agg_xyz = trand(B, K, 3, gen=gen)

    with torch.no_grad():
        net = torch.nn.functional.relu(tm.bn1(tm.conv1(features)))
        net = torch.nn.functional.relu(tm.bn2(tm.conv2(net)))
        net = tm.conv3(net)
        t_end = t_decode(
            net,
            {"aggregated_vote_xyz": agg_xyz},
            dc.num_heading_bin,
            dc.num_size_cluster,
        )

    # flax: replay the head with mapped weights (channels-last)
    import flax.linen as nn

    from rfdnet_tpu.models.common import BatchNorm, Dense

    class _Head(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(2):
                x = Dense(128, name=f"conv{i+1}")(x)
                x = BatchNorm(name=f"bn{i+1}")(x, train=False)
                x = nn.relu(x)
            return Dense(net.shape[1], name="conv3")(x)

    params = {
        "conv1": dense_from_conv1d(tm.conv1),
        "conv2": dense_from_conv1d(tm.conv2),
        "conv3": dense_from_conv1d(tm.conv3),
    }
    stats = {}
    for i in (1, 2):
        p, s = bn_params(getattr(tm, f"bn{i}"))
        params[f"bn{i}"] = p
        stats[f"bn{i}"] = s

    j_net = _Head().apply(
        {"params": params, "batch_stats": stats}, t2j(features.transpose(2, 1))
    )
    j_end = j_decode(j_net, t2j(agg_xyz), dc.num_heading_bin, dc.num_size_cluster)

    for key in (
        "objectness_scores",
        "center",
        "heading_scores",
        "heading_residuals_normalized",
        "size_scores",
        "size_residuals_normalized",
        "sem_cls_scores",
    ):
        allclose(j_end[key], t_end[key].numpy())


# ================================================================== pointseg
def _pointseg_params(tm):
    def stn_tree(stn):
        params, stats = {}, {}
        for i in (1, 2, 3):
            params[f"conv{i}"] = dense_from_conv1d(getattr(stn, f"conv{i}"))
        for i in (1, 2, 3):
            params[f"fc{i}"] = dense_from_linear(getattr(stn, f"fc{i}"))
        for i in (1, 2, 3, 4, 5):
            p, s = bn_params(getattr(stn, f"bn{i}"))
            params[f"bn{i}"] = p
            stats[f"bn{i}"] = s
        return params, stats

    params, stats = {}, {}
    feat_p, feat_s = {}, {}
    feat_p["stn"], feat_s["stn"] = stn_tree(tm.feat.stn)
    feat_p["fstn"], feat_s["fstn"] = stn_tree(tm.feat.fstn)
    for i in (1, 2, 3):
        feat_p[f"conv{i}"] = dense_from_conv1d(getattr(tm.feat, f"conv{i}"))
        p, s = bn_params(getattr(tm.feat, f"bn{i}"))
        feat_p[f"bn{i}"] = p
        feat_s[f"bn{i}"] = s
    params["feat"], stats["feat"] = feat_p, feat_s
    for i in (1, 2, 3, 4):
        params[f"conv{i}"] = dense_from_conv1d(getattr(tm, f"conv{i}"))
    for i in (1, 2, 3):
        p, s = bn_params(getattr(tm, f"bn{i}"))
        params[f"bn{i}"] = p
        stats[f"bn{i}"] = s
    return params, stats


def test_pointseg_parity(gen):
    from models.iscnet.modules.pointseg import PointSeg as TorchPointSeg

    from rfdnet_tpu.models.pointseg import PointSeg

    tm = TorchPointSeg(num_class=2, channel=4)
    randomize_bn_stats(tm, gen)
    tm.eval()

    B, N = 2, 128
    x = trand(B, 4, N, gen=gen)
    with torch.no_grad():
        t_logp, t_trans_feat = tm(x)

    params, stats = _pointseg_params(tm)
    jm = PointSeg(num_class=2, channel=4)
    j_logp, j_trans_feat = jm.apply(
        {"params": params, "batch_stats": stats},
        t2j(x.transpose(2, 1)),
        train=False,
    )
    allclose(j_trans_feat, t_trans_feat.numpy())
    allclose(j_logp, t_logp.numpy())


def test_feature_transform_regularizer_parity(gen):
    from models.iscnet.modules.pointseg import feature_transform_reguliarzer

    from rfdnet_tpu.models.pointseg import feature_transform_regularizer

    trans = trand(4, 64, 64, gen=gen)
    t = feature_transform_reguliarzer(trans)
    j = feature_transform_regularizer(t2j(trans))
    allclose(j, t.numpy())


# ========================================================== onet block layers
def test_resnet_pointnet_parity(gen):
    from models.iscnet.modules.layers import ResnetPointnet as TorchRPN

    from rfdnet_tpu.models.layers import ResnetPointnet

    tm = TorchRPN(c_dim=512, dim=7, hidden_dim=512)
    tm.eval()
    B, T = 2, 96
    p = trand(B, T, 7, gen=gen)
    with torch.no_grad():
        t_c = tm(p)

    params = {
        "fc_pos": dense_from_linear(tm.fc_pos),
        "fc_c": dense_from_linear(tm.fc_c),
    }
    for i in range(5):
        params[f"block_{i}"] = resnet_block_fc_params(getattr(tm, f"block_{i}"))
    jm = ResnetPointnet(c_dim=512, hidden_dim=512)
    j_c = jm.apply({"params": params}, t2j(p))
    allclose(j_c, t_c.numpy())


def test_encoder_latent_parity(gen):
    from models.iscnet.modules.encoder_latent import Encoder_Latent

    from rfdnet_tpu.models.layers import EncoderLatent

    tm = Encoder_Latent(z_dim=32, c_dim=512, dim=3)
    tm.eval()
    B, T = 3, 64
    p = trand(B, T, 3, gen=gen)
    occ = (torch.rand(B, T, generator=gen) > 0.5).float()
    c = trand(B, 512, gen=gen)
    with torch.no_grad():
        t_mean, t_logstd = tm(p, occ, c)

    params = {
        name: dense_from_linear(getattr(tm, name))
        for name in ("fc_0", "fc_pos", "fc_c", "fc_1", "fc_2", "fc_3",
                     "fc_mean", "fc_logstd")
    }
    jm = EncoderLatent(z_dim=32)
    j_mean, j_logstd = jm.apply({"params": params}, t2j(p), t2j(occ), t2j(c))
    allclose(j_mean, t_mean.numpy())
    allclose(j_logstd, t_logstd.numpy())


def _decoder_trees(tm):
    params = {"fc_p": dense_from_conv1d(tm.fc_p),
              "fc_out": dense_from_conv1d(tm.fc_out)}
    stats = {}
    if tm.z_dim != 0:
        params["fc_z"] = dense_from_linear(tm.fc_z)
    for i, blk in enumerate(tm.blocks):
        p, s = cresnet_block_params(blk)
        params[f"block{i}"] = p
        stats[f"block{i}"] = s
    p, s = cbn_params(tm.bn)
    params["bn"] = p
    stats["bn"] = s
    return params, stats


def test_decoder_cbatchnorm_parity(gen):
    from models.iscnet.modules.occ_decoder import (
        DecoderCBatchNorm as TorchDecoder,
    )

    from rfdnet_tpu.models.layers import DecoderCBatchNorm

    tm = TorchDecoder(dim=3, z_dim=32, c_dim=512, hidden_size=256)
    randomize_bn_stats(tm, gen)
    # give the zero-initialized convs real weights so the test isn't trivial
    with torch.no_grad():
        for blk in tm.blocks:
            blk.fc_1.weight.copy_(trand(*blk.fc_1.weight.shape, gen=gen, scale=0.1))
            blk.bn_0.conv_gamma.weight.copy_(
                trand(*blk.bn_0.conv_gamma.weight.shape, gen=gen, scale=0.05))
            blk.bn_1.conv_beta.weight.copy_(
                trand(*blk.bn_1.conv_beta.weight.shape, gen=gen, scale=0.05))
    tm.eval()

    B, T = 2, 200
    p = trand(B, T, 3, gen=gen)
    z = trand(B, 32, gen=gen)
    c = trand(B, 512, gen=gen)
    with torch.no_grad():
        t_logits = tm(p, z, c)

    params, stats = _decoder_trees(tm)
    jm = DecoderCBatchNorm(z_dim=32)
    j_logits = jm.apply(
        {"params": params, "batch_stats": stats},
        t2j(p), t2j(z), t2j(c), train=False,
    )
    allclose(j_logits, t_logits.numpy())


def test_decoder_cbatchnorm_train_mode_parity(gen):
    """Train-mode BN (batch statistics) parity, including the running-stat
    update convention (torch: new = (1-m)*old + m*batch, unbiased var)."""
    from models.iscnet.modules.occ_decoder import (
        DecoderCBatchNorm as TorchDecoder,
    )

    from rfdnet_tpu.models.layers import DecoderCBatchNorm

    tm = TorchDecoder(dim=3, z_dim=0, c_dim=64, hidden_size=32)
    randomize_bn_stats(tm, gen)
    # snapshot params + PRE-forward running stats (t2j copies to jax arrays,
    # so the torch in-place stat updates below don't alias into them)
    params, stats0 = _decoder_trees(tm)
    tm.train()

    B, T = 4, 50
    p = trand(B, T, 3, gen=gen)
    c = trand(B, 64, gen=gen)
    t_logits = tm(p, None, c).detach()  # mutates tm's running stats

    jm = DecoderCBatchNorm(z_dim=0, hidden_size=32)
    j_logits, new_vars = jm.apply(
        {"params": params, "batch_stats": stats0},
        t2j(p), None, t2j(c), train=True, mutable=["batch_stats"],
    )
    allclose(j_logits, t_logits.numpy(), atol=1e-4, rtol=1e-3)
    # running-stat update parity ((1-m)*old + m*batch, unbiased batch var)
    t_bn0 = tm.blocks[0].bn_0.bn
    j_bn0 = new_vars["batch_stats"]["block0"]["bn_0"]["bn"]
    allclose(j_bn0["mean"], t_bn0.running_mean.numpy(), atol=1e-4, rtol=1e-3)
    allclose(j_bn0["var"], t_bn0.running_var.numpy(), atol=1e-4, rtol=1e-3)


# ==================================================================== onet
def test_onet_compute_loss_parity(gen, monkeypatch):
    """Full ONet.compute_loss (KL + summed BCE + 16^3 voxel export) with the
    posterior sample pinned to its mean on both sides."""
    import torch.distributions as dist
    from models.iscnet.modules.occupancy_net import ONet as TorchONet

    from rfdnet_tpu.models.occnet import ONet

    cfg = _FakeCfg(
        {
            "data": {
                "z_dim": 32,
                "use_cls_for_completion": False,
                "skip_propagate": True,
                "c_dim": 512,
                "threshold": 0.5,
            }
        },
        _DC(),
    )
    tm = TorchONet(cfg)
    randomize_bn_stats(tm, gen)
    with torch.no_grad():
        for blk in tm.decoder.blocks:
            blk.fc_1.weight.copy_(trand(*blk.fc_1.weight.shape, gen=gen, scale=0.1))
    tm.eval()

    monkeypatch.setattr(dist.Normal, "rsample", lambda self, *a, **k: self.mean)

    Nb, T = 4, 64
    feats = trand(Nb, 512, gen=gen)
    pts = trand(Nb, T, 3, gen=gen, scale=0.3)
    occ = (torch.rand(Nb, T, generator=gen) > 0.5).float()
    cls_codes = torch.zeros(Nb, 8)
    with torch.no_grad():
        t_loss, t_vox = tm.compute_loss(feats, pts, occ, cls_codes,
                                        export_shape=True)

    params = {"decoder": _decoder_trees(tm.decoder)[0]}
    stats = {"decoder": _decoder_trees(tm.decoder)[1]}
    enc = tm.encoder_latent
    params["encoder_latent"] = {
        name: dense_from_linear(getattr(enc, name))
        for name in ("fc_0", "fc_pos", "fc_c", "fc_1", "fc_2", "fc_3",
                     "fc_mean", "fc_logstd")
    }
    jm = ONet(z_dim=32, c_dim=512)
    (j_loss, j_vox) = jm.apply(
        {"params": params, "batch_stats": stats},
        t2j(feats), t2j(pts), t2j(occ), t2j(cls_codes),
        None, False, None, True,
        method=ONet.compute_loss,
    )
    allclose(j_loss, t_loss.numpy(), atol=1e-3, rtol=1e-4)
    assert np.array_equal(np.asarray(j_vox), t_vox.numpy().reshape(Nb, 16, 16, 16))


# ================================================================ nn_distance
def test_nn_distance_parity(gen):
    from net_utils.nn_distance import huber_loss as t_huber
    from net_utils.nn_distance import nn_distance as t_nnd

    from rfdnet_tpu.ops.nn_distance import huber_loss as j_huber
    from rfdnet_tpu.ops.nn_distance import nn_distance as j_nnd

    pc1 = trand(2, 32, 3, gen=gen)
    pc2 = trand(2, 48, 3, gen=gen)
    for l1smooth, l1 in ((False, False), (True, False), (False, True)):
        td1, ti1, td2, ti2 = t_nnd(pc1, pc2, l1smooth=l1smooth, l1=l1)
        jd1, ji1, jd2, ji2 = j_nnd(t2j(pc1), t2j(pc2), l1smooth=l1smooth, l1=l1)
        allclose(jd1, td1.numpy())
        allclose(jd2, td2.numpy())
        assert np.array_equal(np.asarray(ji1), ti1.numpy())
        assert np.array_equal(np.asarray(ji2), ti2.numpy())

    err = trand(5, 7, gen=gen)
    allclose(j_huber(t2j(err), delta=1.0), t_huber(err, delta=1.0).numpy())


# ==================================================================== losses
def _make_loss_inputs(gen, B=2, N=256, ns=64, K=32, M=10):
    dc = _DC()
    est = {
        "seed_xyz": trand(B, ns, 3, gen=gen),
        "seed_inds": torch.randint(0, N, (B, ns), generator=gen),
        "vote_xyz": trand(B, ns, 3, gen=gen),
        "aggregated_vote_xyz": trand(B, K, 3, gen=gen),
        "aggregated_vote_inds": torch.randint(0, ns, (B, K), generator=gen),
        "objectness_scores": trand(B, K, 2, gen=gen),
        "center": trand(B, K, 3, gen=gen),
        "heading_scores": trand(B, K, dc.num_heading_bin, gen=gen),
        "heading_residuals_normalized": trand(B, K, dc.num_heading_bin, gen=gen),
        "size_scores": trand(B, K, dc.num_size_cluster, gen=gen),
        "size_residuals_normalized": trand(B, K, dc.num_size_cluster, 3, gen=gen),
        "sem_cls_scores": trand(B, K, dc.num_class, gen=gen),
    }
    mask = torch.zeros(B, M)
    mask[:, : M // 2] = 1.0
    gt = {
        "center_label": trand(B, M, 3, gen=gen),
        "box_label_mask": mask,
        "heading_class_label": torch.randint(
            0, dc.num_heading_bin, (B, M), generator=gen
        ),
        "heading_residual_label": trand(B, M, gen=gen, scale=0.1),
        "size_class_label": torch.randint(
            0, dc.num_size_cluster, (B, M), generator=gen
        ),
        "size_residual_label": trand(B, M, 3, gen=gen, scale=0.1),
        "sem_cls_label": torch.randint(0, dc.num_class, (B, M), generator=gen),
        "vote_label": trand(B, N, 9, gen=gen, scale=0.2),
        "vote_label_mask": torch.randint(0, 2, (B, N), generator=gen),
    }
    return est, gt, dc


def _to_jax(d):
    out = {}
    for k, v in d.items():
        out[k] = t2j(v)
    return out


def test_detection_loss_parity(gen):
    from models.loss import DetectionLoss as TorchDetectionLoss

    from rfdnet_tpu.models.losses import detection_loss

    est, gt, dc = _make_loss_inputs(gen)
    t_out = TorchDetectionLoss(weight=1)(est, gt, dc)
    j_out = detection_loss(_to_jax(est), _to_jax(gt), dc)
    for key in (
        "total", "vote_loss", "objectness_loss", "box_loss", "sem_cls_loss",
        "pos_ratio", "neg_ratio", "center_loss", "heading_cls_loss",
        "heading_reg_loss", "size_cls_loss", "size_reg_loss", "obj_acc",
    ):
        tv = t_out[key]
        tv = tv.item() if torch.is_tensor(tv) else tv
        allclose(j_out[key], tv, atol=1e-4, rtol=1e-4)


def test_boxnet_detection_loss_parity(gen):
    from models.loss import BoxNetDetectionLoss as TorchBoxNetLoss

    from rfdnet_tpu.models.losses import boxnet_detection_loss

    est, gt, dc = _make_loss_inputs(gen)
    t_out = TorchBoxNetLoss(weight=1)(est, gt, dc)
    j_out = boxnet_detection_loss(_to_jax(est), _to_jax(gt), dc)
    for key in ("total", "objectness_loss", "box_loss", "sem_cls_loss",
                "obj_acc"):
        tv = t_out[key]
        tv = tv.item() if torch.is_tensor(tv) else tv
        allclose(j_out[key], tv, atol=1e-4, rtol=1e-4)


def test_onet_loss_parity(gen):
    from models.loss import ONet_Loss

    from rfdnet_tpu.models.losses import onet_loss

    value = trand(6, 2, gen=gen).abs()
    t_out = ONet_Loss(weight=0.005)(value)
    j_out = onet_loss(
        jnp.mean(t2j(value)[:, 0]), jnp.mean(t2j(value)[:, 1]), weight=0.005
    )
    allclose(j_out["total_loss"], t_out["total_loss"].item())
    allclose(j_out["completion_loss"], t_out["completion_loss"])
    allclose(j_out["mask_loss"], t_out["mask_loss"])


def test_chamfer_loss_parity(gen):
    """ChamferDist loss vs the (CPU-correct) reference formula
    (`models/loss.py:274-286`)."""
    from rfdnet_tpu.models.losses import chamfer_loss

    s1 = trand(2, 40, 3, gen=gen)
    s2 = trand(2, 56, 3, gen=gen)
    d = torch.cdist(s1, s2) ** 2
    t_loss = 0.7 * (d.min(2)[0].mean() + d.min(1)[0].mean())
    allclose(chamfer_loss(t2j(s1), t2j(s2), weight=0.7), t_loss.numpy())


# ===================================================== network-level parity
def _ref_dataset_config():
    """The reference's real ScannetConfig (loads its means npz relative to
    the reference root)."""
    import os

    from ref_torch import REF

    cwd = os.getcwd()
    try:
        os.chdir(REF)
        from configs.scannet_config import ScannetConfig

        return ScannetConfig()
    finally:
        os.chdir(cwd)


def test_get_proposal_id_objectness_parity(gen):
    """`network.py:387-436` mode='objectness' (the completion-training
    proposal selection) vs the on-device fixed-shape ranking."""
    from types import SimpleNamespace

    from models.iscnet.modules.network import ISCNet as TorchISCNet

    from rfdnet_tpu.models.iscnet import select_completion_proposals

    B, K, M, limit = 3, 40, 12, 10
    est = {
        "center": trand(B, K, 3, gen=gen),
        "objectness_scores": trand(B, K, 2, gen=gen),
    }
    mask = torch.zeros(B, M)
    mask[0, :7] = 1
    mask[1, :3] = 1
    mask[2, :M] = 1
    data = {
        "box_label_mask": mask,
        "center_label": trand(B, M, 3, gen=gen),
        "sem_cls_label": torch.randint(0, 8, (B, M), generator=gen).float(),
    }
    fake_self = SimpleNamespace(
        cfg=SimpleNamespace(
            config={"data": {"completion_limit_in_train": limit}}
        )
    )
    t_ids = TorchISCNet.get_proposal_id(fake_self, est, data, mode="objectness")

    probs = torch.softmax(est["objectness_scores"], dim=2)[..., 1]
    j_ids = select_completion_proposals(
        t2j(probs),
        t2j(est["center"]),
        t2j(data["center_label"]),
        t2j(data["box_label_mask"]),
        t2j(data["sem_cls_label"]),
        limit,
    )
    assert np.array_equal(np.asarray(j_ids), t_ids.numpy())


def test_parse_predictions_nms_parity(gen):
    """Reference `parse_predictions` (numpy box decode + class-aware 3D NMS
    + remove_empty_box, `ap_helper.py:131-264`) vs the on-device path."""
    from net_utils.ap_helper import parse_predictions as t_parse

    from rfdnet_tpu.models.iscnet import ISCNet

    dc_ref = _ref_dataset_config()
    dc = _DC()

    B, K, N = 2, 64, 2048
    est = {
        "center": trand(B, K, 3, gen=gen, scale=1.5),
        "objectness_scores": trand(B, K, 2, gen=gen),
        "heading_scores": trand(B, K, 12, gen=gen),
        "heading_residuals_normalized": trand(B, K, 12, gen=gen, scale=0.3),
        "size_scores": trand(B, K, 8, gen=gen),
        "size_residuals_normalized": trand(B, K, 8, 3, gen=gen, scale=0.1),
        "sem_cls_scores": trand(B, K, 8, gen=gen),
    }
    pc = trand(B, N, 3, gen=gen, scale=1.5)
    gt = {"point_clouds": pc}

    config_dict = {
        "dataset_config": dc_ref,
        "remove_empty_box": True,
        "use_3d_nms": True,
        "nms_iou": 0.25,
        "use_old_type_nms": False,
        "cls_nms": True,
        "conf_thresh": 0.05,
        "per_class_proposal": True,
    }
    eval_dict, parsed_t = t_parse(est, gt, config_dict)

    model = ISCNet(mean_size_arr=dc.mean_size_arr, phase="detection")
    parsed_j = model.parse_predictions(
        {k: t2j(v) for k, v in est.items()},
        nms_iou=0.25,
        use_cls_nms=True,
        point_clouds=t2j(pc),
        remove_empty_box=True,
    )

    allclose(
        parsed_j["pred_corners_3d_upright_camera"],
        parsed_t["pred_corners_3d_upright_camera"],
        atol=2e-4, rtol=1e-3,
    )
    allclose(parsed_j["obj_prob"], parsed_t["obj_prob"], atol=1e-5, rtol=1e-4)
    allclose(parsed_j["sem_cls_probs"], parsed_t["sem_cls_probs"],
             atol=1e-5, rtol=1e-4)
    assert np.array_equal(
        np.asarray(parsed_j["pred_sem_cls"]), parsed_t["pred_sem_cls"].numpy()
    )
    assert np.array_equal(
        np.asarray(parsed_j["pred_mask"]).astype(np.uint8),
        eval_dict["pred_mask"],
    )


def test_parse_predictions_nms_parity_no_empty_filter(gen):
    """Same as above with remove_empty_box off (the fast-eval default)."""
    from net_utils.ap_helper import parse_predictions as t_parse

    from rfdnet_tpu.models.iscnet import ISCNet

    dc_ref = _ref_dataset_config()
    dc = _DC()
    B, K = 2, 48
    est = {
        "center": trand(B, K, 3, gen=gen, scale=1.5),
        "objectness_scores": trand(B, K, 2, gen=gen),
        "heading_scores": trand(B, K, 12, gen=gen),
        "heading_residuals_normalized": trand(B, K, 12, gen=gen, scale=0.3),
        "size_scores": trand(B, K, 8, gen=gen),
        "size_residuals_normalized": trand(B, K, 8, 3, gen=gen, scale=0.1),
        "sem_cls_scores": trand(B, K, 8, gen=gen),
    }
    config_dict = {
        "dataset_config": dc_ref,
        "remove_empty_box": False,
        "use_3d_nms": True,
        "nms_iou": 0.25,
        "use_old_type_nms": False,
        "cls_nms": True,
        "conf_thresh": 0.05,
        "per_class_proposal": True,
    }
    eval_dict, _ = t_parse(est, {"point_clouds": None}, config_dict)
    model = ISCNet(mean_size_arr=dc.mean_size_arr, phase="detection")
    parsed_j = model.parse_predictions(
        {k: t2j(v) for k, v in est.items()}, nms_iou=0.25, use_cls_nms=True
    )
    assert np.array_equal(
        np.asarray(parsed_j["pred_mask"]).astype(np.uint8),
        eval_dict["pred_mask"],
    )
