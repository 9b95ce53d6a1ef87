"""Device mesh & sharding for data-parallel training over ICI.

The reference's only parallelism is single-process `nn.DataParallel`
(/root/reference/main.py:91-94): input scatter, per-replica forward, gradient
reduction in the gather's backward. The TPU-native equivalent (SURVEY.md 2.11):

  * a 1-D `Mesh` over all chips with axis 'data';
  * parameters/optimizer state replicated, batch sharded on axis 0;
  * the jitted train step is GSPMD-partitioned: every loss mean over the
    sharded batch lowers to a psum over ICI — that psum IS the gradient
    all-reduce, no hand-written collectives needed.

Works identically on a real v5e pod slice and on N virtual CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=N) for testing.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(jax.devices()) if devices is None else list(devices)
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over the data axis; broadcast trailing axes."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put every array in the batch pytree with axis-0 sharding."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def shard_state(state: Any, mesh: Mesh) -> Any:
    """Replicate the train state across the mesh."""
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), state)
