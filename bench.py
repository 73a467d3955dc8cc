"""End-to-end throughput benchmark: scenes/sec for detection + instance
reconstruction, measured at the reference's TEST PROTOCOL settings
(`--mode test`, `models/iscnet/modules/network.py:56-180` +
`models/iscnet/modules/generator.py:54-197`).

Headline metric ("protocol"): wall-clock scenes/sec for
  80k-point scene -> PointNet++ backbone -> voting -> proposal head ->
  on-device class-aware 3D NMS (iou 0.25) with remove_empty_box ->
  completion conditioning for up to 64 confident survivors
  (`generate_limit=64`, the model default matching `ISCNet_test.yaml`)
  -> eval completion loss + 16^3 voxel export -> batched dense 32^3
  occupancy decode -> HOST C++ MARCHING CUBES per valid proposal.
Wall-clock includes device->host transfer and all host post-processing
(and, on the dev tunnel, ~33 ms/dispatch RPC overhead x 2 dispatches —
so the recorded number is a lower bound on bare-metal throughput).

Secondary lines (same JSON object, `secondary` key):
  - protocol_refit : protocol + 100-step chamfer box/mesh refit
    (`network.py:182-291`), the `--mode test, phase=completion` path.
  - demo_scale     : pure device time at 8 reconstructed proposals
    (round-1's headline, kept for continuity).
  - mean_valid_proposals : how many of the 64 slots NMS+conf actually
    kept (random-init weights; protocol MC cost scales with this).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "scenes/sec", "vs_baseline": N, ...}

vs_baseline: the reference publishes no throughput numbers (BASELINE.md);
we use an estimated 0.4 scenes/sec for the reference's GPU test loop
(per-scene Python NMS + per-proposal chunked occupancy evals + CPU
marching cubes dominate; see SURVEY.md §3.2) until a measured baseline
exists. The north-star target is >=5x (BASELINE.json).
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

# Persistent compile cache: the 80k-scale generate program is a large
# compile over the remote-compile tunnel; cache it across runs.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)


def _enable_compile_cache():
    # config.update, not just the env var: this image's sitecustomize
    # imports jax at interpreter startup (axon PJRT plugin), so env vars
    # set from Python never bind to jax's config defaults
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )

REF_SCENES_PER_SEC_EST = 0.4  # round-1 estimate, kept for context

# Measured floor under vs_baseline (VERDICT r2 item 5): the reference's
# HOST-side protocol stages (parse_predictions python box loop + numpy
# class-NMS + parse_groundtruths + assembly, `ap_helper.py:131-368`) are
# pure numpy/python and were TIMED here via tools/bench_ref_host.py.
# They run serially per scene on any hardware, so 1/t_host is an upper
# bound on reference scenes/sec no GPU can beat — the denominator below
# is that measured bound (see BASELINE.md for the recorded derivation).
# The bound scales with single-core CPU speed (measured 1.571/s on the
# round-3 box, 2.0/s on the round-4 box), so it is RE-MEASURED LIVE at
# bench time on the same host via measure_ref_bound() below; this
# constant is only the fallback if the live measurement fails. The live
# bound also credits the reference our faster marching-cubes extractor
# for its host MC stage (PyMCubes absent here) — generous to the
# reference, i.e. vs_baseline never overstates the speedup.
REF_SCENES_PER_SEC_BOUND = 1.571  # fallback (round-3 box measurement)


def measure_ref_bound() -> tuple[float, str]:
    """Same-session measured reference throughput upper bound
    (scenes/sec) + provenance string for the JSON secondary."""
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tools"))
        from bench_ref_host import measure_host_floor

        # scenes=10 matches the recorded BASELINE.md derivation and the
        # standalone tool default (ADVICE r4)
        m = measure_host_floor(scenes=10)
        return (
            float(m["ref_scenes_per_sec_upper_bound"]),
            "measured live this run (tools/bench_ref_host.py, "
            f"host floor {m['host_per_scene_s']:.3f} s/scene: "
            f"parse_predictions {m['parse_predictions_s']:.3f} + "
            f"generation MC {m['generation_mc_s']:.3f} + "
            "parse_gt/assembly; excludes ALL reference GPU time)",
        )
    except Exception as e:  # torch/shim failure: fall back, say so
        return (
            REF_SCENES_PER_SEC_BOUND,
            f"fallback constant (live measurement failed: {e!r}); "
            "round-3 box measurement, tools/bench_ref_host.py",
        )

def measure_link() -> dict:
    """Live dev-tunnel characterization (VERDICT r4 item 1b): upload and
    download MB/s on fresh 4 MB buffers plus null-dispatch RPC latency.
    The headline wall-clock line is a function of these shared-infra
    numbers (measured 3.9 MB/s at r4 judging vs ~25 MB/s at r2) — they
    are recorded next to it so the build's own cost stays decidable."""
    import jax
    import jax.numpy as jnp

    n = 1 << 20  # 4 MB f32
    x = jnp.zeros((n,), jnp.float32)
    bump = jax.jit(lambda x, i: x + i)
    null = jax.jit(lambda i: jnp.zeros((8,), jnp.float32) + i)
    np.asarray(bump(x, 1.0))
    np.asarray(null(0.0))
    rpc = []
    for i in range(8):
        t0 = time.perf_counter()
        np.asarray(null(float(i)))
        rpc.append(time.perf_counter() - t0)
    ups, downs = [], []
    host = np.zeros((n,), np.float32)
    for i in range(3):
        a = host + np.float32(i)  # fresh buffer defeats caching
        t0 = time.perf_counter()
        jax.device_put(a).block_until_ready()
        ups.append(time.perf_counter() - t0)
        y = bump(x, float(i))
        y.block_until_ready()  # exclude compute; time the copy alone
        t0 = time.perf_counter()
        np.asarray(y)
        downs.append(time.perf_counter() - t0)
    mb = n * 4 / 1e6
    return {
        "rpc_ms": round(float(np.median(rpc)) * 1e3, 1),
        "up_MBps": round(mb / float(np.median(ups)), 1),
        "down_MBps": round(mb / float(np.median(downs)), 1),
    }


NUM_POINTS = int(os.environ.get("BENCH_POINTS", 80_000))
GRID_RES = 32
PROTOCOL_LIMIT = 64   # ISCNet generate_limit default (= test protocol)
DEMO_LIMIT = 8        # round-1 demo-scale secondary line
SCENES = int(os.environ.get("BENCH_SCENES", 8))
DEVICE_ITERS = 10     # fori_loop trips for the device-time secondary


def _find_trained_ckpt() -> str | None:
    """Newest protocol-run joint-stage best checkpoint, if present
    (BENCH_CKPT overrides). The checkpoints are gitignored build
    artifacts — on a fresh checkout the bench falls back to random-init
    weights and says so in the JSON."""
    path = os.environ.get("BENCH_CKPT")
    if path:
        return path if os.path.isdir(path) else None
    import glob

    # fallback chain: if the 3-stage chain was interrupted mid-run the
    # bench still uses the furthest trained weights available (the tag in
    # the JSON records exactly which stage/checkpoint was used)
    for pat in (
        "out/protocol_run/stage3_joint/*/model_best",
        "out/protocol_run/stage3_joint/*/model_last",
        "out/protocol_run/stage2_completion/*/model_best",
        "out/protocol_run/stage2_completion/*/model_last",
        "out/protocol_run/stage1_detection/*/model_best",
    ):
        cands = sorted(glob.glob(pat))
        if cands:
            return cands[-1]
    return None


def _load_trained(variables):
    """Overlay trained params/batch_stats onto freshly-initialized
    variables. Returns (variables, tag) where tag records the weight
    provenance for the bench JSON."""
    path = _find_trained_ckpt()
    if path is None:
        return variables, "random-init"
    try:
        from rfdnet_tpu.train.checkpoint import CheckpointIO, partial_load

        ckpt = CheckpointIO(os.path.dirname(path), log=lambda *a: None)
        src, _ = ckpt.load(path)
        quiet = lambda *a, **k: None  # noqa: E731
        params = partial_load(variables["params"], src["params"], quiet)
        stats = partial_load(
            dict(variables.get("batch_stats", {})),
            src.get("batch_stats", {}), quiet,
        )
        return {"params": params, "batch_stats": stats}, f"trained ({path})"
    except Exception as e:
        return variables, f"random-init (ckpt load failed: {e!r})"


def _load_protocol_scenes(max_scenes: int = 4) -> list[dict] | None:
    """Up to `max_scenes` REAL validation scenes from the protocol
    dataset (gitignored; regenerable via tools/gen_synthetic_dataset.py).
    None when absent — the bench then uses the synthetic jittered scene."""
    split = os.path.join("out", "synth_ds", "splits", "scannetv2_val.json")
    if not os.path.exists(split):
        return None
    try:
        from rfdnet_tpu.config.scannet import ScannetConfig
        from rfdnet_tpu.data.scannet import ScanNetDataset, collate

        ds = ScanNetDataset(
            split, mode="test", phase="completion", num_points=NUM_POINTS,
            dataset_config=ScannetConfig(),
            shapenet_path=os.path.join("out", "synth_ds", "shapenet"),
        )
        scenes = []
        for i in range(min(max_scenes, len(ds))):
            b = collate([ds[i]])
            scenes.append({
                k: v for k, v in b.items()
                if not isinstance(v, list) and k not in
                ("object_voxels", "object_points_iou",
                 "object_points_iou_occ", "scan_idx")
            })
        return scenes or None
    except Exception:
        return None


def _make_batch(limit_model):
    import jax
    import jax.numpy as jnp

    from rfdnet_tpu.config.scannet import ScannetConfig
    from rfdnet_tpu.data.synthetic import synthetic_scene_batch

    dc = ScannetConfig()
    batch = synthetic_scene_batch(
        np.random.RandomState(0), batch_size=1, num_points=NUM_POINTS,
        num_objects=8, mean_size_arr=dc.mean_size_arr,
    )
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    variables = limit_model.init(
        jax.random.PRNGKey(0), batch, train=False, rng=jax.random.PRNGKey(1)
    )
    return dc, batch, variables


def bench_protocol(refit: bool, mise: bool = False, bf16: bool = False,
                   weights: str = "auto",
                   scenes_mode: str = "auto") -> tuple[float, float, dict, dict]:
    """Wall-clock scenes/sec at full test-protocol settings.

    mise=True swaps the dense 32^3 grid for the MISE octree path
    (resolution_0=16, upsampling_steps=2 -> effective 64^3, the ONet-style
    adaptive mode `external/libmise/mise.pyx` enables) — device-resident
    v2: global adaptive budgets + transfer-sparse download.
    bf16=True enables the occupancy decoder's bfloat16 activation chain
    (`decoder_dtype`, the production serving mode; f32 is the parity
    default).
    weights="random" / scenes_mode="synthetic" force the round-3
    comparable configuration (random-init weights, jittered synthetic
    scene) regardless of which artifacts exist on disk — VERDICT r4
    item 5 asks for one round of overlap between the old and new
    headline definitions.

    Returns (scenes_per_sec, mean_valid_proposals, per-stage stats of
    the median pass — seconds plus bytes_up/bytes_down per scene —,
    weights/scenes provenance info)."""
    import jax
    import jax.numpy as jnp

    from rfdnet_tpu.config.scannet import ScannetConfig
    from rfdnet_tpu.eval.refit import fit_meshes_to_scan
    from rfdnet_tpu.meshing.generator import Generator3D
    from rfdnet_tpu.meshing.transfer import SparseGridFetcher
    from rfdnet_tpu.models import ISCNet

    dc = ScannetConfig()
    model = ISCNet(
        mean_size_arr=dc.mean_size_arr,
        phase="completion",
        generate_limit=PROTOCOL_LIMIT,
        decoder_dtype="bfloat16" if bf16 else None,
    )
    _, batch, variables = _make_batch(model)
    # Trained weights + real protocol scenes when present: random-init
    # weights decode to EMPTY occupancy grids (zero iso-crossings), which
    # understates the host marching-cubes and grid-transfer cost. With
    # the protocol-run checkpoint the meshes (and the transfer-sparse
    # payload) are real. Falls back to random-init + a synthetic scene on
    # a fresh checkout (both artifacts are gitignored/regenerable).
    if weights == "random":
        weights_tag = "random-init (forced: r3-comparable line)"
    else:
        variables, weights_tag = _load_trained(variables)
    scene_batches = (None if scenes_mode == "synthetic"
                     else _load_protocol_scenes())
    if scene_batches is not None:
        scene_pcs_np = [
            np.asarray(s["point_clouds"], np.float32) for s in scene_batches
        ]
        scene_batches = [
            jax.tree_util.tree_map(jnp.asarray, s) for s in scene_batches
        ]

    # dense-grid mode fuses the proposal-grid decode into the SAME jitted
    # program as detection+completion: ONE device dispatch per scene (the
    # MISE octree path is inherently iterative and keeps its own dispatches)
    # fused Pallas decoder chain on TPU (ops/cbn_decoder.py)
    impl = "pallas" if jax.default_backend() == "tpu" else None
    SPARSE_BUDGET = 1 << 19  # transfer-sparse dense grids (sign bits +
    # iso-neighborhood values; byte-identical meshes, ~4-8x less traffic)
    base_kw = dict(
        nms_iou=0.25, use_cls_nms=True, dump_threshold=0.05,
        remove_empty_box=True,
        decode_grid_res=None if mise else GRID_RES,
        grid_dtype=None if mise else "float16",
        grid_impl=None if bf16 else impl,
    )
    apply_gen = partial(
        lambda v, d, **kw: model.apply(
            v, d, method=ISCNet.generate, mutable=False, **kw),
        **base_kw,
    )
    gen_fn = jax.jit(partial(
        apply_gen, grid_sparse_budget=None if mise else SPARSE_BUDGET,
    ))
    gen_fn_dense = jax.jit(apply_gen)  # sparse-overflow fallback
    # f16 at the jit boundary: transfer-only quantization of the chunked
    # MISE logits (decoder math stays f32; cannot flip an occupancy sign)
    decode = jax.jit(lambda f, c, p: model.apply(
        variables, f, c, p, method=ISCNet.decode_occupancy, mutable=False,
        impl=impl,
    ).astype(jnp.float16))
    if mise:
        generator = Generator3D(decode, resolution0=16, upsampling_steps=2)
    else:
        generator = Generator3D(
            decode, resolution0=GRID_RES, upsampling_steps=0
        )

    pc_np = np.asarray(batch["point_clouds"])
    stages = {"device+xfer": 0.0, "mesh_extract": 0.0, "refit": 0.0,
              "bytes_up": 0.0, "bytes_down": 0.0}
    fetcher = SparseGridFetcher()

    import threading

    def dispatch(i: int):
        """Launch scene i's device program (async), then materialize ALL
        its outputs in a background thread — np.asarray releases the GIL
        during the actual device->host copy, so scene i+1's transfer
        genuinely overlaps scene i's host marching cubes even when the
        backend has no copy_to_host_async. For the MISE path the octree
        program and its compaction/downloads are dispatched here too, so
        the only synchronous work left in consume() is the extraction
        itself. The reference's test loop is fully serial
        (`test_epoch.py:10-41`)."""
        if scene_batches is not None:
            d = dict(scene_batches[i % len(scene_batches)])
            base_np = scene_pcs_np[i % len(scene_batches)]
        else:
            d = dict(batch)
            base_np = pc_np
        # fresh per-scene jitter so no host/device caching is flattering
        pc_host = base_np + np.float32(1e-4) * np.float32(i)
        pc = jnp.asarray(pc_host)
        d["point_clouds"] = pc
        out = gen_fn(variables, d)
        raw = None
        if mise:
            raw = generator.dispatch_octree_global(
                out["gen"]["features"], out["gen"]["cls_codes"],
                out["gen"]["valid"].reshape(-1),
            )
        # async-copy ONLY what materialize() reads (the sparse grid
        # payload goes through the counts-sized valid-prefix fetcher; the
        # per-proposal conditioning codes stay on device)
        gen_small = {k: v for k, v in out["gen"].items()
                     if k not in ("features", "cls_codes")}
        for leaf in jax.tree_util.tree_leaves(
            (out["parsed"], gen_small, out.get("grids"),
             out.get("grid_counts"), out["completion_loss"])
        ):
            try:
                leaf.copy_to_host_async()
            except AttributeError:
                pass
        box: dict = {"_down": 0}

        def fetch(v):
            a = np.asarray(v)
            box["_down"] += a.nbytes
            return a

        def materialize():
            try:
                box["parsed"] = {
                    k: fetch(v) for k, v in out["parsed"].items()
                }
                box["gen"] = {
                    k: (v if k in ("features", "cls_codes") else fetch(v))
                    for k, v in out["gen"].items()
                }
                box["completion_loss"] = float(out["completion_loss"])
                box["_down"] += 4
                valid_np = box["gen"]["valid"].reshape(-1).astype(bool)
                if mise:
                    # syncs totals, adaptively re-dispatches on budget
                    # overflow, starts the counts-sized download
                    box["handle"] = generator.resolve_octree_global(
                        raw, out["gen"]["features"],
                        out["gen"]["cls_codes"],
                        out["gen"]["valid"].reshape(-1),
                    )
                    box["_down"] += (
                        generator._mise_v2_fetcher.last_bytes
                        + box["handle"]["counts"].nbytes + 8
                    )
                else:
                    counts = fetch(out["grid_counts"])
                    res = fetcher.fetch(
                        out["grid_bits"], out["grid_vals"], counts,
                        valid_np, vox=out.get("shape_voxels_bits"),
                    )
                    if res is not None:
                        bits_np, vals_np, vox_np = res
                        box["_down"] += fetcher.last_bytes
                        box["grid_bits"] = bits_np
                        box["grid_vals"] = vals_np
                        box["grid_counts"] = counts
                        if vox_np is not None:
                            box["shape_voxels"] = vox_np
                    else:  # sparse budget overflow: dense re-dispatch
                        box["grid_bits"] = fetch(out["grid_bits"])
                        box["grid_vals"] = np.zeros((0,), np.float16)
                        box["grid_counts"] = counts
                if ("shape_voxels" not in box
                        and out.get("shape_voxels_bits") is not None):
                    box["shape_voxels"] = fetch(out["shape_voxels_bits"])
            except Exception as e:  # surfaced at join time
                box["err"] = e

        th = threading.Thread(target=materialize)
        th.start()
        return {"th": th, "box": box, "out": out, "pc": pc,
                "pc_np": pc_host, "d": d, "_up": pc_host.nbytes}

    def consume(pending) -> int:
        t0 = time.perf_counter()
        pending["th"].join()
        box = pending["box"]
        if "err" in box:
            raise box["err"]
        valid = box["gen"]["valid"].reshape(-1)
        if os.environ.get("BENCH_PROBE") and "grid_counts" in box:
            c = box["grid_counts"]
            print("probe grid_counts:", int(c.sum()), "max/prop",
                  int(c.max()), "valid", int(valid.sum()), flush=True)
        t1 = time.perf_counter()
        if mise:
            meshes = generator.finish_meshes_global(
                box["handle"], valid=valid,
            )
        else:
            meshes = generator.meshes_from_sparse_grids(
                box["grid_bits"], box["grid_vals"], box["grid_counts"],
                GRID_RES, valid=valid,
            )
            if meshes is None:  # budget overflow: dense re-dispatch
                dense = gen_fn_dense(variables, pending["d"])
                g = np.asarray(dense["grids"])
                box["_down"] += g.nbytes
                meshes = generator.meshes_from_grids(g, valid=valid)
        t2 = time.perf_counter()
        if refit:
            fit_meshes_to_scan(
                box["parsed"], meshes, box["gen"]["proposal_ids"],
                box["gen"]["valid"], pending["pc_np"], 0.05,
            )
        stages["device+xfer"] += t1 - t0
        stages["mesh_extract"] += t2 - t1
        stages["refit"] += time.perf_counter() - t2
        stages["bytes_up"] += pending["_up"]
        stages["bytes_down"] += box["_down"]
        return int(valid.sum())

    consume(dispatch(0))  # compile (generate + decode [+ refit])
    consume(dispatch(1))  # warmup steady-state
    # median-of-3 measurement passes (VERDICT r2 item 6): tunnel-bound
    # wall-clock lines swing ±15% run-to-run with shared-infra load; the
    # median of three full passes makes regressions visible through the
    # noise. Per-stage medians ride along for the JSON secondary.
    rates, valid_means, stage_runs = [], [], []
    base = 2
    for rep in range(3):
        for k in stages:
            stages[k] = 0.0
        t0 = time.perf_counter()
        nvalid = []
        pending = dispatch(base)
        for i in range(SCENES):
            nxt = dispatch(base + 1 + i) if i + 1 < SCENES else None
            nvalid.append(consume(pending))
            pending = nxt
        dt = (time.perf_counter() - t0) / SCENES
        base += SCENES + 1
        rates.append(1.0 / dt)
        valid_means.append(float(np.mean(nvalid)))
        stage_runs.append({k: v / SCENES for k, v in stages.items()})
    if os.environ.get("BENCH_BREAKDOWN"):
        print([{k: round(v, 4) for k, v in s.items()} for s in stage_runs])
    med = int(np.argsort(rates)[1])
    info = {
        "weights": weights_tag,
        "scenes": (f"{len(scene_batches)} real protocol val scenes"
                   if scene_batches is not None
                   else "synthetic jittered scene"),
    }
    return rates[med], valid_means[med], stage_runs[med], info


def bench_protocol_device_only() -> float:
    """Pure device seconds/scene for the FULL protocol program (64
    proposal slots, sparse-grid export — everything the headline line
    dispatches), fori_loop-chained so the tunnel's per-dispatch RPC
    cancels out. This is the `device_ms` term of the bare-metal
    projection (VERDICT r4 item 1b)."""
    import jax
    import jax.numpy as jnp

    from rfdnet_tpu.config.scannet import ScannetConfig
    from rfdnet_tpu.models import ISCNet

    dc = ScannetConfig()
    model = ISCNet(
        mean_size_arr=dc.mean_size_arr,
        phase="completion",
        generate_limit=PROTOCOL_LIMIT,
    )
    _, batch, variables = _make_batch(model)
    variables, _ = _load_trained(variables)
    impl = "pallas" if jax.default_backend() == "tpu" else None
    kw = dict(
        nms_iou=0.25, use_cls_nms=True, dump_threshold=0.05,
        remove_empty_box=True, decode_grid_res=GRID_RES,
        grid_dtype="float16", grid_impl=impl,
        grid_sparse_budget=1 << 19,
    )

    def scene_fn(variables, d):
        out = model.apply(
            variables, d, method=ISCNet.generate, mutable=False, **kw
        )
        return (out["parsed"], out["gen"], out["grid_bits"],
                out["grid_vals"], out["grid_counts"],
                out["completion_loss"], out["shape_voxels_bits"])

    def scalarize(tree):
        import jax as _j

        return sum(
            jnp.sum(leaf.astype(jnp.float32))
            for leaf in _j.tree_util.tree_leaves(tree)
        )

    d0 = dict(batch)

    @jax.jit
    def run_n(variables, d):
        def body(i, carry):
            eps, acc = carry
            dd = dict(d)
            dd["point_clouds"] = d["point_clouds"] + eps
            s = scalarize(scene_fn(variables, dd))
            return s * 1e-38, acc + s

        _, acc = jax.lax.fori_loop(
            0, DEVICE_ITERS, body, (jnp.float32(0), jnp.float32(0))
        )
        return acc

    @jax.jit
    def null(variables, d):
        return jnp.sum(d["point_clouds"].ravel()[:1])

    np.asarray(run_n(variables, d0))
    np.asarray(run_n(variables, d0))
    np.asarray(null(variables, d0))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run_n(variables, d0))
        t_run = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(null(variables, d0))
        ts.append(max(t_run - (time.perf_counter() - t0), 1e-9)
                  / DEVICE_ITERS)
    return float(np.median(ts))


def bench_demo_scale() -> float:
    """Round-1 device-time secondary: 8 reconstructed proposals, device
    program only (everything up to host marching cubes), fori_loop-timed
    to cancel the tunnel's per-dispatch RPC latency."""
    import jax
    import jax.numpy as jnp

    from rfdnet_tpu.config.scannet import ScannetConfig
    from rfdnet_tpu.models import ISCNet, make_3d_grid

    dc = ScannetConfig()
    model = ISCNet(
        mean_size_arr=dc.mean_size_arr,
        phase="completion",
        generate_limit=DEMO_LIMIT,
    )
    _, batch, variables = _make_batch(model)
    grid = make_3d_grid((-0.55,) * 3, (0.55,) * 3, (GRID_RES,) * 3)

    def scene_fn(variables, point_clouds):
        end_points, prop_feats, parsed = model.apply(
            variables, point_clouds, method=ISCNet.generate_detections,
            mutable=False,
        )
        gen = model.apply(
            variables, end_points, prop_feats, parsed,
            {"point_clouds": point_clouds},
            method=ISCNet.generate_completion, mutable=False,
        )
        pts = jnp.broadcast_to(
            grid[None], (gen["features"].shape[0],) + grid.shape
        )
        logits = model.apply(
            variables, gen["features"], gen["cls_codes"], pts,
            method=ISCNet.decode_occupancy, mutable=False,
        )
        return (
            parsed["pred_corners_3d_upright_camera"],
            parsed["pred_mask"],
            gen["valid"],
            logits,
        )

    pc = batch["point_clouds"]

    def scalarize(tree):
        # full-output reduction so no branch of the program is DCE-able
        return sum(
            jnp.sum(leaf.astype(jnp.float32))
            for leaf in jax.tree_util.tree_leaves(tree)
        )

    @jax.jit
    def run_n(variables, pc):
        def body(i, carry):
            eps, acc = carry
            out = scene_fn(variables, pc + eps)
            s = scalarize(out)
            return s * 1e-38, acc + s

        _, acc = jax.lax.fori_loop(
            0, DEVICE_ITERS, body, (jnp.float32(0), jnp.float32(0))
        )
        return acc

    @jax.jit
    def null(variables, pc):
        return jnp.sum(pc.ravel()[:1])

    np.asarray(run_n(variables, pc))  # compile + warmup
    np.asarray(run_n(variables, pc))
    np.asarray(null(variables, pc))
    t0 = time.perf_counter()
    np.asarray(run_n(variables, pc))
    t_run = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(null(variables, pc))
    t_null = time.perf_counter() - t0
    dt = max(t_run - t_null, 1e-9) / DEVICE_ITERS
    return 1.0 / dt


def bench_train() -> dict:
    """Training-step line (VERDICT r3 item 6): completion-phase train step
    (fwd + all losses + bwd + Adam) at the reference's batch 8 x 80k
    points (`ISCNet.yaml:13,64`), timed ON DEVICE by chaining TRAIN_ITERS
    steps inside one jitted fori_loop (the tunnel's ~33 ms/dispatch RPC
    makes per-call wall-clock meaningless), with an MFU estimate from
    XLA's own per-step FLOP count."""
    import jax
    import jax.numpy as jnp

    from rfdnet_tpu.config.scannet import ScannetConfig
    from rfdnet_tpu.data.synthetic import synthetic_scene_batch
    from rfdnet_tpu.models import ISCNet
    from rfdnet_tpu.train.trainer import (
        init_state,
        make_optimizer,
        make_train_step,
    )

    B = 8
    dc = ScannetConfig()
    model = ISCNet(mean_size_arr=dc.mean_size_arr, phase="completion")
    batch = synthetic_scene_batch(
        np.random.RandomState(0), batch_size=B, num_points=NUM_POINTS,
        num_objects=8, mean_size_arr=dc.mean_size_arr,
    )
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    tx = make_optimizer()
    state = init_state(model, tx, batch)
    raw_step = make_train_step(model, dc, tx, donate=False, jit=False)

    ITERS = 8

    @jax.jit
    def run_n(state, batch, rng):
        def body(i, st):
            # perturb the point cloud per iteration: FPS/ball-query are
            # parameter-FREE subgraphs, so with a loop-invariant batch
            # XLA hoists them out of the fori_loop and the measured step
            # excludes ~40 ms of real sampling cost (r5 profiling find)
            b = dict(batch)
            b["point_clouds"] = batch["point_clouds"] + (
                jnp.float32(1e-7) * st.step.astype(jnp.float32)
            )
            st2, _ = raw_step(
                st, b, jax.random.fold_in(rng, i),
                jnp.float32(1e-3), jnp.float32(0.5),
            )
            return st2
        st = jax.lax.fori_loop(0, ITERS, body, state)
        # probe one updated leaf + the step counter (cannot be DCE'd:
        # every parameter depends on the whole loss graph)
        leaf = jax.tree_util.tree_leaves(st.params)[0]
        return jnp.sum(leaf.astype(jnp.float32)), st.step

    @jax.jit
    def null(state, batch, rng):
        return jnp.sum(batch["point_clouds"].ravel()[:1])

    key = jax.random.PRNGKey(0)
    np.asarray(run_n(state, batch, key)[0])  # compile + warmup
    np.asarray(null(state, batch, key))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run_n(state, batch, key)[0])
        t_run = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(null(state, batch, key))
        t_null = time.perf_counter() - t0
        times.append(max(t_run - t_null, 1e-9) / ITERS)
    step_s = float(np.median(times))

    flops = None
    try:
        one = jax.jit(raw_step).lower(
            state, batch, key, jnp.float32(1e-3), jnp.float32(0.5)
        ).compile().cost_analysis()
        if isinstance(one, (list, tuple)):
            one = one[0]
        flops = float(one.get("flops", 0.0)) or None
    except Exception:
        pass
    out = {
        "train_step_ms": round(step_s * 1000, 2),
        "train_scenes_per_sec": round(B / step_s, 2),
        "train_batch": f"{B}x{NUM_POINTS}",
    }
    if flops:
        # v5e peak: 197 TFLOP/s (bf16/int8 MXU; f32 ops run at MXU
        # default precision). XLA's cost model counts each fused op once.
        out["train_tflops_per_sec"] = round(flops / step_s / 1e12, 1)
        out["train_mfu_vs_197tf"] = round(flops / step_s / 197e12, 4)
    return out


def bench_serve8() -> dict:
    """8-way data-parallel serving overhead (VERDICT r4 item 8) on the
    virtual 8-device CPU mesh, via a fresh subprocess so the platform /
    device-count env applies (tools/bench_serve8.py). Relative
    per-device overhead is the hardware-meaningful number; skipped
    gracefully if the subprocess fails or times out."""
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tools", "bench_serve8.py")],
            capture_output=True, text=True, timeout=1200,
        )
        line = out.stdout.strip().splitlines()[-1]
        d = json.loads(line)
        return {
            "serve8_per_device_overhead": d["per_device_overhead"],
            "serve8_note": f"{d['n_devices']}-way batch-sharded fused "
                f"generate vs single device (virtual CPU mesh, "
                f"{d['points']} pts): t8={d['t_sharded_batch_s']}s "
                f"t1={d['t_single_scene_s']}s — {d['note']}",
        }
    except Exception as e:
        return {"serve8_per_device_overhead": None,
                "serve8_note": f"skipped ({e!r})"}


def main() -> None:
    _enable_compile_cache()
    link = measure_link()
    protocol, mean_valid, stages, bench_info = bench_protocol(refit=False)
    protocol_refit, _, _, _ = bench_protocol(refit=True)
    protocol_mise, _, mise_stages, _ = bench_protocol(refit=False, mise=True)
    # round-3-comparable overlap line (VERDICT r4 item 5): random-init
    # weights + jittered synthetic scene, the r1-r3 headline definition
    protocol_r3, _, _, _ = bench_protocol(
        refit=False, weights="random", scenes_mode="synthetic"
    )
    device_s = bench_protocol_device_only()
    demo = bench_demo_scale()
    train_lines = bench_train()
    serve8 = bench_serve8()
    ref_bound, ref_note = measure_ref_bound()

    # bare-metal projection (VERDICT r4 item 1): on-host deployment the
    # per-scene cost is device compute + host mesh extraction + the
    # measured payload over a PCIe-class 10 GB/s link (vs the dev
    # tunnel's single-digit-MB/s shared WAN). Host MC overlaps the next
    # scene's device work in the pipelined serving loop, so the critical
    # path is max(device, host) + payload; the projection still SUMS them
    # (conservative).
    payload = stages["bytes_up"] + stages["bytes_down"]
    host_s = stages["mesh_extract"] + stages["refit"]
    projected = 1.0 / (device_s + host_s + payload / 10e9)
    print(json.dumps({
        "metric": "scenes_per_sec_test_protocol",
        "value": round(protocol, 4),
        "unit": "scenes/sec",
        "vs_baseline": round(protocol / ref_bound, 4),
        "secondary": {
            "scenes_per_sec_protocol_refit": round(protocol_refit, 4),
            "scenes_per_sec_protocol_mise_64": round(protocol_mise, 4),
            "scenes_per_sec_r3_comparable": round(protocol_r3, 4),
            "scenes_per_sec_demo_scale_device": round(demo, 4),
            "mean_valid_proposals": round(mean_valid, 2),
            **bench_info,
            # --- environment + payload decomposition (VERDICT r4 item 1)
            "tunnel_rpc_ms": link["rpc_ms"],
            "tunnel_up_MBps": link["up_MBps"],
            "tunnel_down_MBps": link["down_MBps"],
            "payload_up_bytes_per_scene": int(stages["bytes_up"]),
            "payload_down_bytes_per_scene": int(stages["bytes_down"]),
            "protocol_device_s_per_scene": round(device_s, 4),
            "protocol_host_s_per_scene": round(host_s, 4),
            "projected_bare_metal_scenes_per_sec": round(projected, 2),
            "projected_vs_baseline": round(projected / ref_bound, 2),
            "projection_model": "1/(device_s + host_s + payload/10GB/s); "
                "device_s fori_loop-timed on chip, host_s measured, "
                "payload counted per scene; assumes PCIe-class host "
                "link + sub-ms dispatch (tunnel RPC measured above)",
            # per-stage split (median pass): device+xfer vs host MC —
            # regressions stay visible through tunnel variance
            "protocol_stage_device_xfer_s": round(stages["device+xfer"], 4),
            "protocol_stage_mesh_extract_s": round(
                stages["mesh_extract"], 4
            ),
            "mise_stage_device_xfer_s": round(
                mise_stages["device+xfer"], 4
            ),
            "mise_stage_mesh_extract_s": round(
                mise_stages["mesh_extract"], 4
            ),
            "mise_payload_down_bytes_per_scene": int(
                mise_stages["bytes_down"]
            ),
            **train_lines,
            **serve8,
            "vs_baseline_denominator": f"{round(ref_bound, 4)}/s — "
                f"{ref_note}; see BASELINE.md",
            "protocol": "generate_limit=64, remove_empty_box, conf 0.05, "
                        "cls-NMS 0.25, dense 32^3 decode (fused pallas "
                        "kernel: bf16 MXU operands + f32 accumulate == "
                        "MXU default-precision f32), transfer-sparse f16 "
                        "grids (sign bits + iso-neighborhood values; "
                        "byte-identical meshes) with counts-sized "
                        "valid-prefix downloads, host marching cubes "
                        "(bit-packed cell scan), depth-1 scene pipeline "
                        "with threaded transfer overlap; wall-clock incl. "
                        "tunnel RPC; all lines median-of-3. device_xfer "
                        "stage = residual transfer wait after overlap. "
                        "mise_64: device-resident octree v2 (global "
                        "adaptive budgets, valid gating, transfer-sparse "
                        "65^3 download)",
        },
    }))


if __name__ == "__main__":
    main()
