"""Per-module device-time breakdown of the training step (VERDICT r4
item 3: "profile the train step and raise MFU from 15.7%").

Times each stage of the completion-phase train step (the reference's
`ISCNet.yaml` batch 8 x 80k configuration) as its own jitted
fori_loop-chained program (null-subtracted, median of 3), plus XLA's
cost-analysis FLOPs per stage, and prints a table:

    python tools/profile_train.py [--iters 8] [--bf16]

Stages (forward+backward+Adam for the full step; forward[+backward]
for the isolated modules):
  full_step           the production train step (make_train_step)
  det_step            detection-phase step (no completion modules)
  backbone_fwd/bwd    Pointnet2Backbone alone (SA1-4 + FP1-2)
  sa1_fwd             SA1 alone (FPS 80k->2048 + ball query + MLP)
  fps_sa1             the Pallas FPS alone at SA1 scale
  ballq_sa1           ball query alone at SA1 scale (2048 x 80k, ns 64)
  vote_prop           voting + proposal head fwd+bwd (seed scale)
  skip_prop           skip propagation fwd+bwd (10 proposals/scene)
  onet_loss           ONet compute_loss fwd+bwd (80 x 2048 occ points)

--bf16 re-times full_step / backbone with bf16 MXU operands in the
shared MLPs (`mlp_dtype="bfloat16"`; f32 accumulate) for the serving /
throughput-mode comparison.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)

import numpy as np


def timed(fn, args, iters, label=""):
    """Null-subtracted fori_loop timing: returns seconds per iteration."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def null(*a):
        return jnp.float32(0.0)

    np.asarray(fn(*args))  # compile + warmup
    np.asarray(null(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        t_run = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(null(*args))
        ts.append(max(t_run - (time.perf_counter() - t0), 1e-9) / iters)
    return float(np.median(ts))


def loop_wrap(step_fn, iters, perturb):
    """Chain `iters` calls of step_fn inside one jitted program; the
    carry is a scalar folded into the input so no call is DCE-able."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*args):
        def body(i, acc):
            out = step_fn(*perturb(args, acc))
            leaves = jax.tree_util.tree_leaves(out)
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return acc + s * 1e-30

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    return run


def flops_of(fn, *args):
    import jax

    try:
        a = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(a, (list, tuple)):
            a = a[0]
        return float(a.get("flops", 0.0))
    except Exception:
        return 0.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--stages", nargs="*", default=None,
                   help="subset of stage names to run")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )

    from rfdnet_tpu.config.scannet import ScannetConfig
    from rfdnet_tpu.data.synthetic import synthetic_scene_batch
    from rfdnet_tpu.models import ISCNet
    from rfdnet_tpu.models.backbone import Pointnet2Backbone
    from rfdnet_tpu.ops import ball_query, furthest_point_sample
    from rfdnet_tpu.train.trainer import (
        init_state, make_optimizer, make_train_step,
    )

    B, N = 8, 80_000
    ITERS = args.iters
    dc = ScannetConfig()
    mlp_dtype = "bfloat16" if args.bf16 else None
    model = ISCNet(mean_size_arr=dc.mean_size_arr, phase="completion",
                   mlp_dtype=mlp_dtype)
    batch = synthetic_scene_batch(
        np.random.RandomState(0), batch_size=B, num_points=N,
        num_objects=8, mean_size_arr=dc.mean_size_arr,
    )
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    tx = make_optimizer()
    state = init_state(model, tx, batch)
    key = jax.random.PRNGKey(0)

    rows = []

    def report(name, secs, flops=0.0):
        tf = flops / secs / 1e12 if flops else 0.0
        rows.append((name, secs * 1e3, tf, 100.0 * tf / 197.0))
        print(f"{name:18s} {secs * 1e3:9.2f} ms"
              + (f"  {tf:7.1f} TF/s  {100 * tf / 197:5.1f}% MFU"
                 if flops else ""), flush=True)

    want = (lambda s: args.stages is None or s in args.stages)

    # ---- full train step -------------------------------------------------
    # the lr operand is perturbed by the (data-dependent) accumulator so
    # XLA cannot hoist the loop-invariant step out of the fori_loop
    raw_step = make_train_step(model, dc, tx, donate=False, jit=False)

    def one_step(st, b, rng, lr):
        # perturb the point cloud by the traced lr so the parameter-FREE
        # FPS/ball-query subgraphs cannot be hoisted out of the timing
        # loop (they depend only on the points)
        b = dict(b)
        b["point_clouds"] = b["point_clouds"] + lr * 1e-7
        st2, _ = raw_step(st, b, rng, lr, jnp.float32(0.5))
        return (st2.params, st2.step)

    lr0 = jnp.float32(1e-3)
    if want("full_step"):
        run = loop_wrap(
            one_step, ITERS,
            lambda a, acc: (a[0], a[1], a[2], a[3] + acc * 1e-38),
        )
        secs = timed(run, (state, batch, key, lr0), ITERS)
        fl = flops_of(one_step, state, batch, key, lr0)
        report("full_step", secs, fl)

    if want("det_step"):
        det_model = ISCNet(mean_size_arr=dc.mean_size_arr, phase="detection",
                           mlp_dtype=mlp_dtype)
        det_state = init_state(det_model, tx, batch)
        det_raw = make_train_step(det_model, dc, tx, donate=False, jit=False)

        def det_one(st, b, rng, lr):
            b = dict(b)
            b["point_clouds"] = b["point_clouds"] + lr * 1e-7
            st2, _ = det_raw(st, b, rng, lr, jnp.float32(0.5))
            return (st2.params, st2.step)

        run = loop_wrap(det_one, ITERS,
                        lambda a, acc: (a[0], a[1], a[2],
                                        a[3] + acc * 1e-38))
        secs = timed(run, (det_state, batch, key, lr0), ITERS)
        fl = flops_of(det_one, det_state, batch, key, lr0)
        report("det_step", secs, fl)

    # ---- backbone alone --------------------------------------------------
    bb = Pointnet2Backbone(input_feature_dim=1, fps_impl=None,
                           mlp_dtype=mlp_dtype)
    pc = batch["point_clouds"]
    bb_vars = bb.init(jax.random.PRNGKey(0), pc, train=True)

    def bb_fwd(v, pc):
        out, _ = bb.apply(v, pc, train=True, mutable=["batch_stats"])
        return out["fp2_features"]

    if want("backbone_fwd"):
        run = loop_wrap(bb_fwd, ITERS,
                        lambda a, acc: (a[0], a[1] + acc))
        secs = timed(run, (bb_vars, pc), ITERS)
        report("backbone_fwd", secs, flops_of(bb_fwd, bb_vars, pc))

    if want("backbone_bwd"):
        def bb_loss(v, pc):
            return jnp.sum(bb_fwd(v, pc).astype(jnp.float32))

        bb_grad = jax.grad(bb_loss)
        run = loop_wrap(bb_grad, ITERS, lambda a, acc: (a[0], a[1] + acc))
        secs = timed(run, (bb_vars, pc), ITERS)
        report("backbone_fwd+bwd", secs, flops_of(bb_grad, bb_vars, pc))

    # ---- SA1 / FPS / ball query micro -----------------------------------
    xyz = pc[..., :3]
    if want("fps_sa1"):
        fps_fn = lambda x: furthest_point_sample(x, 2048)
        run = loop_wrap(lambda x: fps_fn(x).astype(jnp.float32), ITERS,
                        lambda a, acc: (a[0] + acc,))
        secs = timed(run, (xyz,), ITERS)
        report("fps_sa1(8x80k)", secs)

    if want("ballq_sa1"):
        centers = xyz[:, :2048]
        bq = lambda x, c: ball_query(x, c, 0.2, 64).astype(jnp.float32)
        run = loop_wrap(bq, ITERS, lambda a, acc: (a[0] + acc, a[1]))
        secs = timed(run, (xyz, centers), ITERS)
        report("ballq_sa1", secs)

    # ---- vote + proposal (seed scale) ------------------------------------
    if want("vote_prop"):
        from rfdnet_tpu.models.proposal import ProposalModule
        from rfdnet_tpu.models.voting import VotingModule

        seeds_xyz = xyz[:, :1024]
        seeds_f = jnp.zeros((B, 1024, 256), jnp.float32)
        vote = VotingModule()
        prop = ProposalModule(
            num_class=8, num_heading_bin=12, num_size_cluster=8,
            num_proposal=256, sampling="seed_fps",
        )
        vv = vote.init(jax.random.PRNGKey(0), seeds_xyz, seeds_f, True)

        def vp_fwd(vv, pv, sx, sf):
            vx, vf = vote.apply(vv, sx, sf, True,
                                mutable=["batch_stats"])[0]
            vf = vf / jnp.linalg.norm(vf, axis=-1, keepdims=True)
            ep, feats = prop.apply(pv, vx, vf, {"seed_xyz": sx}, True,
                                   mutable=["batch_stats"])[0]
            return feats

        pv = prop.init(jax.random.PRNGKey(0), seeds_xyz, seeds_f,
                       {"seed_xyz": seeds_xyz}, True)

        def vp_loss(vv, pv, sx, sf):
            return jnp.sum(vp_fwd(vv, pv, sx, sf).astype(jnp.float32))

        g = jax.grad(vp_loss, argnums=(0, 1))
        run = loop_wrap(g, ITERS,
                        lambda a, acc: (a[0], a[1], a[2] + acc, a[3]))
        secs = timed(run, (vv, pv, seeds_xyz, seeds_f), ITERS)
        report("vote_prop_bwd", secs, flops_of(g, vv, pv, seeds_xyz, seeds_f))

    # ---- skip propagation -------------------------------------------------
    if want("skip_prop"):
        from rfdnet_tpu.models.skip_propagation import SkipPropagation

        P = 10  # completion_limit in train
        sp = SkipPropagation(c_dim=512, hidden_dim=512, input_feature_dim=1)
        centers = xyz[:, :P]
        headings = jnp.zeros((B, P), jnp.float32)
        box_feats = jnp.zeros((B, P, 128), jnp.float32)
        inst = jnp.zeros((B, N), jnp.int32)
        pinst = jnp.zeros((B, P), jnp.int32)
        spv = sp.init(jax.random.PRNGKey(0), centers, headings, box_feats,
                      pc, inst, pinst, True, None)

        def sp_loss(v, c, h, bf, pc_, il, pil):
            out, _ = sp.apply(v, c, h, bf, pc_, il, pil, True, None,
                              mutable=["batch_stats"])
            feats, mloss = out
            return jnp.sum(feats.astype(jnp.float32)) + mloss

        g = jax.grad(sp_loss)
        run = loop_wrap(
            g, ITERS,
            lambda a, acc: (a[0], a[1] + acc) + a[2:],
        )
        secs = timed(run, (spv, centers, headings, box_feats, pc, inst,
                           pinst), ITERS)
        report("skip_prop_bwd", secs,
               flops_of(g, spv, centers, headings, box_feats, pc, inst,
                        pinst))

    # ---- ONet loss ---------------------------------------------------------
    if want("onet_loss"):
        from rfdnet_tpu.models.occnet import ONet

        P = 10
        onet = ONet(z_dim=32, c_dim=512, threshold=0.5)
        feats = jnp.zeros((B * P, 512), jnp.float32)
        pts = jnp.zeros((B * P, 2048, 3), jnp.float32)
        occ = jnp.zeros((B * P, 2048), jnp.float32)
        cls = jnp.zeros((B * P, 8), jnp.float32)
        ov = onet.init(jax.random.PRNGKey(0), feats, pts, occ, cls,
                       jax.random.PRNGKey(1), True, method=ONet.compute_loss)

        def onet_l(v, f, p, o, c):
            (loss, _), _ = onet.apply(
                v, f, p, o, c, jax.random.PRNGKey(1), True,
                method=ONet.compute_loss, mutable=["batch_stats"],
            )
            return jnp.sum(loss)

        g = jax.grad(onet_l)
        run = loop_wrap(g, ITERS,
                        lambda a, acc: (a[0], a[1] + acc) + a[2:])
        secs = timed(run, (ov, feats, pts, occ, cls), ITERS)
        report("onet_loss_bwd", secs, flops_of(g, ov, feats, pts, occ, cls))

    print("\nstage breakdown (ms, TF/s, %MFU of 197 TF/s v5e peak):")
    for name, ms, tf, mfu in rows:
        print(f"  {name:18s} {ms:9.2f}"
              + (f" {tf:8.1f} {mfu:6.1f}" if tf else ""))


if __name__ == "__main__":
    main()
