"""Device meshes and shardings.

The reference has no distributed training (single GPU hard-coded,
reference ``train.py:433``).  Two TPU-native scaling axes exist here
(SURVEY.md §2.4; built in ``parallel.sharding``):

- **ray-DP** (``--parallel_mode rays``, default): one scene per step, its
  ray batch sharded over the mesh — preserves the reference's 1-scene/step
  training semantics exactly, so N chips accelerate the reference workload.
  ``--shard_mvs_views`` additionally shards the MVS cascade's per-view
  work over the same axis (``parallel.mvs_views``) so the cascade — the
  dominant, otherwise-replicated part of the step — scales too.
- **scene-DP** (``--parallel_mode scenes``): each training sample is one
  scene tuple (1 target + V-1 source views), so a batch of N scenes shards
  cleanly over the mesh with replicated parameters — gradients reduce over
  ICI via the psum pjit inserts automatically.  NOTE: N scenes/step is an
  N-fold effective-batch increase vs the reference (LR guidance in the
  ``mesh_shape`` note in ``config.py``).
- **grid** (``--parallel_mode grid --mesh_shape S R --mesh_axes data
  rays``): the two composed on a 2D mesh — S scenes/step with each scene's
  rays sharded R-way, so large meshes aren't forced to choose between an
  S=n_devices effective batch (scene-DP) and S=1 (ray-DP).  Objective
  semantics == scene-DP with S scenes/step.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape: Sequence[int] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    devices = np.array(jax.devices())
    if mesh_shape is None:
        mesh_shape = (len(devices),)
    devices = devices[:int(np.prod(mesh_shape))].reshape(mesh_shape)
    return Mesh(devices, axis_names)


def scene_batch_sharding(mesh: Mesh, axis: str = "data"):
    """Sharding for a scene-batched sample pytree: leading dim = scenes."""
    def spec_for(leaf):
        return NamedSharding(mesh, P(axis, *([None] * (leaf.ndim - 1))))
    return spec_for


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
