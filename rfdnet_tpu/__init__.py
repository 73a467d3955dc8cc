"""rfdnet_tpu: a TPU-native (JAX / XLA / Pallas / pjit) framework for joint 3D
object detection and semantic instance mesh reconstruction from raw indoor
point clouds.

Rebuilds the capabilities of RfD-Net (GAP-LAB-CUHK-SZ/RfDNet, CVPR 2021) —
the ISCNet pipeline: PointNet++ backbone, VoteNet-style Hough voting and
proposal generation, skip-propagated conditional occupancy decoding, mesh
extraction, three-stage training, and the ScanNet mAP evaluation harness —
as an idiomatic TPU stack:

- fixed-shape geometry ops (``rfdnet_tpu.ops``) built on Pallas kernels and
  XLA-friendly gathers instead of custom CUDA extensions,
- flax.linen models in channels-last layout so shared MLPs run on the MXU
  (``rfdnet_tpu.models``),
- pjit/shard_map data-parallel training over a ``jax.sharding.Mesh``
  (``rfdnet_tpu.parallel``, ``rfdnet_tpu.train``),
- host-side C++ meshing (marching cubes / MISE / voxelization) in
  ``rfdnet_tpu.meshing``,
- a numpy evaluation stack (``rfdnet_tpu.eval``) for VOC-style mAP and
  mesh-mAP.
"""

__version__ = "0.1.0"
