"""Load the upstream reference's torch modules (CPU) for numerical parity
tests, plus torch->flax weight-mapping helpers.

The reference at /root/reference is CUDA-era torch 1.7 code. To import its
pure-torch modules on CPU torch 2.13 we:

- pre-seed bare packages in sys.modules (bypassing the package __init__.py
  files, which chain-import the entire framework including CUDA extensions),
- stub the compiled externals (pointnet2_ops, chamfer CUDA ext, pykdtree)
  with CPU-correct equivalents where their output matters and inert
  placeholders where only importability matters,
- patch .cuda() to a no-op (the reference calls it unconditionally, e.g.
  `models/loss.py:21`, `net_utils/ap_helper.py:158`).

Only used by tests — never by the framework itself.
"""

from __future__ import annotations

import sys
import types

import numpy as np

REF = "/root/reference"


def _bare_pkg(name: str, path: str | None):
    if name in sys.modules:
        return sys.modules[name]
    m = types.ModuleType(name)
    if path is not None:
        m.__path__ = [path]
    sys.modules[name] = m
    return m


_installed = False


def install_reference():
    """Make `models.*`, `net_utils.*`, `configs.*`, `external.common` from
    /root/reference importable on CPU torch. Idempotent."""
    global _installed
    if _installed:
        return
    import torch

    # .cuda() no-ops (reference assumes a GPU exists)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    # torch.cuda.FloatTensor constructor (`models/loss.py:175,186`)
    torch.cuda.FloatTensor = torch.FloatTensor

    if REF not in sys.path:
        sys.path.insert(0, REF)

    # bare packages: skip __init__.py chain-imports
    _bare_pkg("models", REF + "/models")
    _bare_pkg("models.iscnet", REF + "/models/iscnet")
    _bare_pkg("models.iscnet.modules", REF + "/models/iscnet/modules")
    _bare_pkg("net_utils", REF + "/net_utils")
    _bare_pkg("configs", REF + "/configs")
    _bare_pkg("utils", REF + "/utils")
    _bare_pkg("external", REF + "/external")

    # ---- compiled-extension stubs ------------------------------------
    # pykdtree: external/common.py imports KDTree at module scope; route to
    # scipy (only used by kdtree-chamfer eval helpers, not by parity paths)
    kd = types.ModuleType("external.libkdtree.pykdtree.kdtree")

    class KDTree:
        def __init__(self, data):
            from scipy.spatial import cKDTree

            self._t = cKDTree(np.asarray(data))

        def query(self, q, k=1):
            return self._t.query(np.asarray(q), k=k)

    kd.KDTree = KDTree
    _bare_pkg("external.libkdtree", None)
    _bare_pkg("external.libkdtree.pykdtree", None)
    sys.modules["external.libkdtree.pykdtree.kdtree"] = kd

    # chamfer CUDA ext: CPU-correct bidirectional NN distance via cdist
    cham = types.ModuleType(
        "external.pyTorchChamferDistance.chamfer_distance"
    )

    class ChamferDistance(torch.nn.Module):
        def forward(self, xyz1, xyz2):
            d = torch.cdist(xyz1, xyz2) ** 2  # (B, N, M)
            d1, i1 = d.min(dim=2)
            d2, i2 = d.min(dim=1)
            return d1, d2, i1.int(), i2.int()

    cham.ChamferDistance = ChamferDistance
    _bare_pkg("external.pyTorchChamferDistance", None)
    sys.modules["external.pyTorchChamferDistance.chamfer_distance"] = cham

    # pointnet2 CUDA ops: the modules below import these names at module
    # scope. furthest_point_sample gets a CPU-correct implementation
    # (including the reference kernel's ||p||^2<=1e-3 skip,
    # `sampling_gpu.cu:101`); the SA/FP wrappers are constructible but
    # raise if actually run.
    p2u = types.ModuleType(
        "external.pointnet2_ops_lib.pointnet2_ops.pointnet2_utils"
    )

    def furthest_point_sample(xyz, npoint):
        pts = xyz.detach().cpu().numpy()
        B, N, _ = pts.shape
        out = np.zeros((B, npoint), dtype=np.int64)
        for b in range(B):
            p = pts[b]
            mind = np.full(N, 1e10, dtype=np.float64)
            cur = 0
            out[b, 0] = 0
            for i in range(1, npoint):
                d = np.sum((p - p[cur]) ** 2, axis=1)
                mag = np.sum(p * p, axis=1)
                upd = mag > 1e-3
                mind[upd] = np.minimum(mind[upd], d[upd])
                cur = int(np.argmax(mind))
                out[b, i] = cur
        return torch.from_numpy(out.astype(np.int32))

    def gather_operation(features, idx):
        # features (B, C, N), idx (B, m) -> (B, C, m)
        idx = idx.long()
        return torch.gather(
            features, 2, idx.unsqueeze(1).expand(-1, features.shape[1], -1)
        )

    p2u.furthest_point_sample = furthest_point_sample
    p2u.gather_operation = gather_operation

    p2m = types.ModuleType(
        "external.pointnet2_ops_lib.pointnet2_ops.pointnet2_modules"
    )

    class _Inert(torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

        def forward(self, *a, **k):  # pragma: no cover
            raise NotImplementedError("CUDA-only module stub")

    for name in (
        "PointnetSAModuleVotes",
        "PointnetSAModuleMSG",
        "PointnetSAModule",
        "PointnetFPModule",
        "STN_Group",
        "STN3d",
    ):
        setattr(p2m, name, type(name, (_Inert,), {}))
    _bare_pkg("external.pointnet2_ops_lib", None)
    _bare_pkg("external.pointnet2_ops_lib.pointnet2_ops", None)
    sys.modules[
        "external.pointnet2_ops_lib.pointnet2_ops.pointnet2_utils"
    ] = p2u
    sys.modules[
        "external.pointnet2_ops_lib.pointnet2_ops.pointnet2_modules"
    ] = p2m

    # plyfile: utils/scannet/scannet_utils.py sys.exits without it; only
    # used for PLY I/O we never invoke
    if "plyfile" not in sys.modules:
        try:
            import plyfile  # noqa: F401
        except ImportError:
            pf = types.ModuleType("plyfile")
            pf.PlyData = object
            pf.PlyElement = object
            sys.modules["plyfile"] = pf

    # trimesh (+ the binvox shell-out): only referenced inside eval
    # functions we don't call; importability is all that's needed
    if "trimesh" not in sys.modules:
        try:
            import trimesh  # noqa: F401
        except ImportError:
            tm = types.ModuleType("trimesh")
            tm_ex = types.ModuleType("trimesh.exchange")
            tm_bv = types.ModuleType("trimesh.exchange.binvox")
            tm_bv.voxelize_mesh = None
            tm_ex.binvox = tm_bv
            tm.exchange = tm_ex
            tm.Trimesh = object
            sys.modules["trimesh"] = tm
            sys.modules["trimesh.exchange"] = tm_ex
            sys.modules["trimesh.exchange.binvox"] = tm_bv

    _installed = True


# ---------------------------------------------------------------- weights
def t2j(t):
    import jax.numpy as jnp

    # np.array(copy) matters: jnp.asarray on CPU can alias the torch
    # buffer zero-copy, and torch in-place ops (BN running-stat updates,
    # inplace ReLU) would silently mutate the "jax" value
    return jnp.asarray(np.array(t.detach().cpu().numpy()))


def dense_from_linear(lin):
    """torch nn.Linear -> flax Dense params."""
    p = {"kernel": t2j(lin.weight).T}
    if lin.bias is not None:
        p["bias"] = t2j(lin.bias)
    return p


def dense_from_conv1d(conv):
    """torch nn.Conv1d(k=1) -> flax Dense params (channels-last)."""
    p = {"kernel": t2j(conv.weight)[:, :, 0].T}
    if conv.bias is not None:
        p["bias"] = t2j(conv.bias)
    return p


def bn_params(bn):
    """torch BatchNorm1d -> (params, batch_stats) for models.common.BatchNorm."""
    return (
        {"scale": t2j(bn.weight), "bias": t2j(bn.bias)},
        {"mean": t2j(bn.running_mean), "var": t2j(bn.running_var)},
    )


def bn_stats(bn):
    """torch BatchNorm1d(affine=False) -> batch_stats for
    _AffinelessBatchNorm."""
    return {"mean": t2j(bn.running_mean), "var": t2j(bn.running_var)}


def cbn_params(cbn):
    """reference CBatchNorm1d -> (params, batch_stats) for layers.CBatchNorm."""
    params = {
        "gamma_kernel": t2j(cbn.conv_gamma.weight)[:, :, 0].T,
        "gamma_bias": t2j(cbn.conv_gamma.bias),
        "beta_kernel": t2j(cbn.conv_beta.weight)[:, :, 0].T,
        "beta_bias": t2j(cbn.conv_beta.bias),
    }
    return params, {"bn": bn_stats(cbn.bn)}


def resnet_block_fc_params(blk):
    """reference ResnetBlockFC -> flax layers.ResnetBlockFC params."""
    p = {"fc_0": dense_from_linear(blk.fc_0), "fc_1": dense_from_linear(blk.fc_1)}
    if blk.shortcut is not None:
        p["shortcut"] = dense_from_linear(blk.shortcut)
    return p


def cresnet_block_params(blk):
    """reference CResnetBlockConv1d -> (params, stats) for
    layers.CResnetBlockConv1d."""
    bn0_p, bn0_s = cbn_params(blk.bn_0)
    bn1_p, bn1_s = cbn_params(blk.bn_1)
    params = {
        "bn_0": bn0_p,
        "bn_1": bn1_p,
        "fc_0": dense_from_conv1d(blk.fc_0),
        "fc_1": dense_from_conv1d(blk.fc_1),
    }
    stats = {"bn_0": bn0_s, "bn_1": bn1_s}
    if blk.shortcut is not None:
        params["shortcut"] = dense_from_conv1d(blk.shortcut)
    return params, stats


def randomize_bn_stats(module, gen):
    """Give every torch BN layer non-trivial running stats so eval-mode
    parity actually exercises the normalization path."""
    import torch

    for m in module.modules():
        if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
            m.running_mean.copy_(
                torch.randn(m.running_mean.shape, generator=gen) * 0.3
            )
            m.running_var.copy_(
                torch.rand(m.running_var.shape, generator=gen) * 1.5 + 0.25
            )
