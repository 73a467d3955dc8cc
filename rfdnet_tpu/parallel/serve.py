"""Multi-chip batched serving: the fused test-protocol generate path
(`ISCNet.generate(decode_grid_res=...)` — detection -> NMS -> completion
conditioning -> dense occupancy grids, ONE traced program) sharded over
the 1-D data mesh.

The reference serves scenes strictly serially (`test_epoch.py:10-41`,
batch 1); its only parallel mode is DataParallel TRAINING. This module is
the serving-side counterpart of `train/trainer.py`'s pjit step: scenes
are batch-sharded over the ``data`` axis, params replicated, and every
device runs the identical fused per-scene program — scenes/sec scales
linearly with mesh size because the generate path has no cross-scene
communication (zero collectives when the batch carries no GT supervision
keys; with `object_points` present the eval completion loss adds one
scalar mean over the axis).

Host-side surface extraction stays per-scene and is fanned out by the
caller (`meshing/generator.py meshes_from_grids` thread pool).
"""

from __future__ import annotations

from functools import partial

import jax

from .mesh import batch_sharding, make_mesh, replicated


def make_sharded_generate(model, variables, mesh=None, **generate_kw):
    """Build (host_batch_dict) -> generate outputs, batch-sharded.

    model: ISCNet (completion phase); variables: its init tree;
    generate_kw: forwarded to `ISCNet.generate` (nms_iou, use_cls_nms,
    dump_threshold, remove_empty_box, decode_grid_res, grid_dtype, ...).
    The batch size per call must be a multiple of the mesh size.

    Outputs keep their batch-sharded placement; pull only what the host
    pipeline needs (`out["grids"]`, `out["parsed"]`) to keep transfers
    minimal.
    """
    if mesh is None:
        mesh = make_mesh()
    gen_type = type(model)

    fn = jax.jit(
        partial(
            lambda v, d, **kw: model.apply(
                v, d, method=gen_type.generate, mutable=False, **kw
            ),
            **generate_kw,
        ),
        in_shardings=(replicated(mesh), batch_sharding(mesh)),
    )
    variables = jax.device_put(variables, replicated(mesh))

    def serve(batch: dict):
        sharding = batch_sharding(mesh)
        batch = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch
        )
        return fn(variables, batch)

    return serve
