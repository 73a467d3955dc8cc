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


def _make_cpu_ext(torch):
    """CPU-correct `pointnet2_ops._ext`: the 9 kernel entry points the
    reference's autograd.Function wrappers call, with the CUDA kernels'
    exact semantics:

    - furthest_point_sampling: first index 0; candidates with
      ||p||^2 <= 1e-3 are EXCLUDED from the max (`sampling_gpu.cu:101`
      `continue` skips them in the reduction);
    - ball_query: scan in index order, strict d2 < r^2, first-hit fills
      all slots before counting (`ball_query_gpu.cu:27-41`);
    - three_nn: 3 smallest distances, earliest index wins ties (strict
      `<` insertion, `interpolate_gpu.cu:33-48`).
    """
    ext = types.ModuleType("pointnet2_ops._ext")

    def furthest_point_sampling(xyz, npoint):
        pts = xyz.detach().cpu().numpy().astype(np.float32)
        B, N, _ = pts.shape
        out = np.zeros((B, npoint), dtype=np.int32)
        for b in range(B):
            p = pts[b]
            cand = np.sum(p * p, axis=1) > 1e-3
            mind = np.full(N, 1e10, dtype=np.float32)
            cur = 0
            for i in range(1, npoint):
                d = np.sum((p - p[cur]) ** 2, axis=1, dtype=np.float32)
                mind = np.minimum(mind, d)
                cur = int(np.argmax(np.where(cand, mind, -1.0)))
                out[b, i] = cur
        return torch.from_numpy(out)

    def gather_points(features, idx):
        # (B, C, N), (B, m) int -> (B, C, m)
        return torch.gather(
            features, 2,
            idx.long().unsqueeze(1).expand(-1, features.shape[1], -1),
        )

    def gather_points_grad(grad_out, idx, N):
        B, C, m = grad_out.shape
        g = grad_out.new_zeros(B, C, N)
        g.scatter_add_(
            2, idx.long().unsqueeze(1).expand(-1, C, -1), grad_out
        )
        return g

    def _d2(a, b, chunk=512):
        # exact (a-b)^2 sums like the CUDA kernels (cdist's matmul
        # expansion rounds differently and can flip radius tests / NN
        # weights); chunked over a's second dim to bound memory
        if a.shape[1] == 0:
            return a.new_zeros(a.shape[0], 0, b.shape[1])
        parts = []
        for i in range(0, a.shape[1], chunk):
            diff = a[:, i : i + chunk, None, :] - b[:, None, :, :]
            parts.append((diff * diff).sum(-1))
        return torch.cat(parts, dim=1)  # (B, m, n)

    def ball_query(new_xyz, xyz, radius, nsample):
        # (B, m, 3), (B, n, 3) -> (B, m, nsample) int32
        d2 = _d2(new_xyz, xyz)  # (B, m, n)
        inside = d2 < radius * radius
        B, m, n = inside.shape
        # stable sort: inside indices first, in index order
        order = torch.argsort((~inside).to(torch.int8), dim=2, stable=True)
        idx = order[:, :, :nsample].clone()
        cnt = inside.sum(dim=2, keepdim=True)  # (B, m, 1)
        pos = torch.arange(nsample).view(1, 1, -1)
        first = idx[:, :, :1].expand(-1, -1, nsample)
        idx = torch.where(pos < cnt, idx, first)
        # no hit at all: the cpp wrapper zero-initialises the output
        # (`ball_query.cpp:20`), so empty neighborhoods stay index 0
        idx = torch.where(cnt > 0, idx, torch.zeros_like(idx))
        return idx.int()

    def group_points(features, idx):
        # (B, C, N), (B, np, ns) -> (B, C, np, ns)
        B, C, N = features.shape
        _, npnt, ns = idx.shape
        flat = idx.long().view(B, 1, npnt * ns).expand(-1, C, -1)
        return torch.gather(features, 2, flat).view(B, C, npnt, ns)

    def group_points_grad(grad_out, idx, N):
        B, C, npnt, ns = grad_out.shape
        g = grad_out.new_zeros(B, C, N)
        flat = idx.long().view(B, 1, npnt * ns).expand(-1, C, -1)
        g.scatter_add_(2, flat, grad_out.reshape(B, C, npnt * ns))
        return g

    def three_nn(unknown, known):
        d2 = _d2(unknown, known)  # (B, n, m)
        order = torch.argsort(d2, dim=2, stable=True)[:, :, :3]
        dist2 = torch.gather(d2, 2, order)
        return dist2, order.int()

    def three_interpolate(features, idx, weight):
        # (B, c, m), (B, n, 3), (B, n, 3) -> (B, c, n)
        B, c, m = features.shape
        n = idx.shape[1]
        flat = idx.long().view(B, 1, n * 3).expand(-1, c, -1)
        gathered = torch.gather(features, 2, flat).view(B, c, n, 3)
        return (gathered * weight.unsqueeze(1)).sum(dim=3)

    def three_interpolate_grad(grad_out, idx, weight, m):
        B, c, n = grad_out.shape
        g = grad_out.new_zeros(B, c, m)
        contrib = grad_out.unsqueeze(-1) * weight.unsqueeze(1)  # (B,c,n,3)
        flat = idx.long().view(B, 1, n * 3).expand(-1, c, -1)
        g.scatter_add_(2, flat, contrib.reshape(B, c, n * 3))
        return g

    ext.furthest_point_sampling = furthest_point_sampling
    ext.gather_points = gather_points
    ext.gather_points_grad = gather_points_grad
    ext.ball_query = ball_query
    ext.group_points = group_points
    ext.group_points_grad = group_points_grad
    ext.three_nn = three_nn
    ext.three_interpolate = three_interpolate
    ext.three_interpolate_grad = three_interpolate_grad
    return ext


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

    # pointnet2 CUDA ops: `pointnet2_utils.py` does `import
    # pointnet2_ops._ext` and falls back to JIT-compiling the CUDA
    # sources (impossible here). Pre-seeding `pointnet2_ops._ext` with
    # CPU-correct implementations of the 9 kernel entry points lets the
    # reference's REAL wrapper modules (`pointnet2_utils.py`,
    # `pointnet2_modules.py` — QueryAndGroup, PointnetSAModuleVotes,
    # PointnetFPModule, STN_Group...) import and run unmodified on CPU,
    # which is what full-composite ISCNet parity requires.
    p2_pkg = _bare_pkg("pointnet2_ops", None)
    p2_pkg._ext = sys.modules["pointnet2_ops._ext"] = _make_cpu_ext(torch)
    _bare_pkg(
        "external.pointnet2_ops_lib", REF + "/external/pointnet2_ops_lib"
    )
    _bare_pkg(
        "external.pointnet2_ops_lib.pointnet2_ops",
        REF + "/external/pointnet2_ops_lib/pointnet2_ops",
    )

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
