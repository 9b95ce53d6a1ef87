"""Device mesh & sharding: data-parallel and FSDP over ICI.

The reference's only parallelism is single-process `nn.DataParallel`
(/root/reference/main.py:91-94): input scatter, per-replica forward, gradient
reduction in the gather's backward. The TPU-native equivalent (SURVEY.md 2.11):

  * a `Mesh` over all chips with axis 'data' (optionally x 'fsdp');
  * batch sharded on axis 0 across every mesh axis;
  * parameters/optimizer state replicated (pure DP), or — with an 'fsdp'
    axis — sharded ZeRO-3 style: each large leaf is split on its largest
    divisible dimension, XLA all-gathers params per layer in the forward and
    reduce-scatters gradients, so per-chip memory for params + Adam moments
    drops by the fsdp factor (the frozen 134M-param VGG included);
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
FSDP_AXIS = "fsdp"

# Leaves smaller than this stay replicated under FSDP: sharding tiny tensors
# (SN u/v vectors, BN stats, biases) buys no memory and costs a collective.
FSDP_MIN_LEAF_ELEMENTS = 1 << 16


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              fsdp: int = 1) -> Mesh:
    """1-D data mesh (fsdp=1, the default) or a 2-D (data, fsdp) mesh.

    fsdp>1 folds that many consecutive devices into the parameter-sharding
    axis; on a pod slice consecutive devices are ICI neighbors, so the
    per-layer all-gather traffic stays on the fastest links.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    if fsdp <= 1:
        return Mesh(np.asarray(devices), (DATA_AXIS,))
    if len(devices) % fsdp:
        raise ValueError(
            f"device count {len(devices)} not divisible by fsdp={fsdp}")
    grid = np.asarray(devices).reshape(len(devices) // fsdp, fsdp)
    return Mesh(grid, (DATA_AXIS, FSDP_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over every mesh axis; broadcast trailing axes."""
    return NamedSharding(mesh, P(tuple(mesh.axis_names)))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_spec(shape: Sequence[int], mesh: Mesh) -> P:
    """FSDP partition spec for one leaf: shard the largest dimension that the
    fsdp axis divides; replicate small or indivisible leaves."""
    axes = dict(zip(mesh.axis_names, mesh.devices.shape))
    k = axes.get(FSDP_AXIS, 1)
    if k <= 1 or int(np.prod(shape)) < FSDP_MIN_LEAF_ELEMENTS:
        return P()
    divisible = [d for d in range(len(shape)) if shape[d] % k == 0]
    if not divisible:
        return P()
    dim = max(divisible, key=lambda d: shape[d])
    spec = [None] * len(shape)
    spec[dim] = FSDP_AXIS
    return P(*spec)


def _put_global(x: Any, sharding: NamedSharding) -> jax.Array:
    """Place one host value onto a (possibly multi-process) sharding.

    Single process: plain `device_put`. Under `jax.distributed` (the
    `--multihost` path, cli/main.py) a mesh spans devices this process cannot
    address, so the host value — identical on every process: the loader's
    sorted index and per-sample seeded masks make batches process-reproducible,
    and states init from the same seed — is assembled into a global array via
    `make_array_from_process_local_data` (global_shape == local shape marks it
    host-replicated; each process materializes only its addressable shards).
    """
    if jax.process_count() > 1:
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape=x.shape)
    return jax.device_put(x, sharding)


def shard_batch(batch: Any, mesh: Mesh, process_local: bool = False) -> Any:
    """Place every array in the batch pytree with axis-0 sharding
    (multi-process safe, see `_put_global`).

    `process_local=True`: each process holds only ITS contiguous slice of the
    global batch (a `Places365Loader(num_shards=process_count)` shard) — the
    global array is assembled by concatenation along the batch axis, so no
    host ever decodes rows another host's devices will consume.
    """
    sharding = batch_sharding(mesh)
    if process_local and jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)),
            batch)
    return jax.tree.map(lambda x: _put_global(x, sharding), batch)


def put_eval_group(mesh: Mesh, group_tree: Any) -> Any:
    """Stage one FIDEvaluator.fid_scan group onto the mesh: the group tree is
    (stacked batches, key_data, num_valid) with stacked arrays shaped
    (group, B, ...) — shard the INNER batch axis over every mesh axis;
    key_data and num_valid replicate. Multi-process safe via `_put_global`.
    Used by Trainer.validate and certified by __graft_entry__
    .dryrun_multichip (the reference's analogue is the DataParallel scatter
    inside frechet_inception_distance.py:86-90)."""
    stacked, key_data, num_valid = group_tree
    inner_batch = NamedSharding(mesh, P(None, tuple(mesh.axis_names)))
    rep = replicated_sharding(mesh)
    return (jax.tree.map(lambda x: _put_global(x, inner_batch), stacked),
            _put_global(key_data, rep), _put_global(num_valid, rep))


def shard_state(state: Any, mesh: Mesh) -> Any:
    """Place the train state on the mesh (multi-process safe).

    Pure data mesh: replicate everything (DataParallel semantics). With an
    fsdp axis: large leaves (conv/linear kernels, embeddings, Adam mu/nu,
    frozen VGG weights) are sharded per `fsdp_spec`; scalars, norm stats and
    SN vectors stay replicated. GSPMD propagates these placements through the
    jitted step, inserting the per-layer all-gathers / gradient
    reduce-scatters of ZeRO-3 automatically.
    """
    def put(x):
        spec = fsdp_spec(np.shape(x), mesh)
        return _put_global(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, state)
