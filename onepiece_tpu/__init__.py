"""onepiece_tpu — a TPU-native RGB-D SLAM & 3D reconstruction framework.

A from-scratch rebuild of the capabilities of the OnePiece C++ library
(reference: wlsdzyzl/OnePiece) designed array-first for TPU hardware:

- All hot kernels (dense RGB-D odometry, ICP, TSDF integration, marching
  cubes, bundle-adjustment Schur reduction) are JAX/XLA programs with
  Pallas implementations for the hottest paths.
- Irregular, data-dependent bookkeeping (voxel-block hash tables, keyframe
  lists, RANSAC orchestration) lives on the host; device code works over
  fixed-capacity padded pools with validity masks.
- Multi-chip scaling uses `jax.sharding.Mesh` + `shard_map` with XLA
  collectives (psum for BA Schur reduction, sharded voxel-block pools).

Layer map (mirrors reference SURVEY.md §1, re-designed):
  geometry/     core math: SE3, camera, point clouds, meshes     (ref: src/Geometry, src/Camera)
  ops/          device kernels & batched numerics                (ref: hot loops across src/)
  odometry/     sparse ORB + dense direct RGB-D tracking         (ref: src/Odometry)
  lcdetection/  loop-closure detection (MILD-equivalent)         (ref: src/LCDetection, 3rdparty/MILD)
  registration/ ICP, FPFH, global RANSAC registration            (ref: src/Registration)
  optimization/ pose-graph GN and full BA with Schur             (ref: src/Optimization)
  integration/  voxel-block TSDF + marching cubes                (ref: src/Integration)
  algorithm/    clustering, patch detection, DCEL rooms          (ref: src/Algorithm)
  parallel/     device-mesh sharding of BA and TSDF pools
  systems/      end-to-end SLAM systems (Dense/BA/FBA fusion)    (ref: example/)
  io/           TUM/ScanNet loaders, PLY/OBJ, trajectories       (ref: src/Tool/IO*)
  utils/        config, timers, metrics, logging
  viz/          offline rendering / debug dumps                  (ref: src/Visualization)
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry math (SE3 chains, 6x6 normal equations, 3x3 covariances) must not
# silently run matmuls in bfloat16 — on TPU the default matmul precision
# would inject ~1e-2 errors into Rodrigues/Kabsch. Hot large-matmul kernels
# (ops/knn.py pairwise distances, hamming matchers) opt into lower precision
# explicitly where it is safe.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persist compiled executables across processes: compiles through the
# remote-TPU tunnel cost minutes, and every CLI/bench invocation is a fresh
# process. Harmless on CPU.
import os as _os

_cache_dir = _os.environ.get(
    "ONEPIECE_COMPILE_CACHE", _os.path.expanduser("~/.cache/onepiece_tpu_xla")
)
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - cache is an optimisation only
    pass

