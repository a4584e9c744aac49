"""Device mesh + sharding policy.

The reference is strictly single-GPU (SURVEY.md §2.10: DDP exists only as dead
commented code).  The TPU-native scaling design is:

  * training: data parallelism over ICI via jax.jit + NamedSharding on the
    batch axis; XLA inserts the psum gradient all-reduce (the NCCL-equivalent
    collective layer),
  * inference / evaluation: embarrassingly parallel per-chip item sharding,
  * long-form audio: OLA chunks are batch-parallel (chunk axis == dp axis);
    AR continuation is inherently sequential (host loop, jitted per chunk).

No TP/PP at this model size (~40M params fits one chip with room for the
sampler's vjp) — a deliberate scope decision, not an omission.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    return Mesh(np.asarray(devs[:n]), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis: str = "dp"):
    """Place a host batch onto the mesh, sharded along the leading axis."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
