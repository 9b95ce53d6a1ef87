"""Multi-process worker for test_multihost.py — NOT collected by pytest.

Each process joins the JAX distributed runtime (the --multihost path of
cli/main.py:105-106), forms the GLOBAL 8-device mesh from its 4 local virtual
CPU devices, assembles globally-sharded inputs with
jax.make_array_from_process_local_data, and runs ONE fused G/D train step.
Prints one JSON line of loss metrics for the parent to compare across
processes. Ref: /root/reference/main.py:91-94 (the reference's one
parallelism mechanism demonstrably runs; this proves ours does too).
"""

import json
import sys


def main() -> int:
    process_id = int(sys.argv[1])
    num_processes = int(sys.argv[2])
    port = sys.argv[3]

    import jax

    # cross-process CPU collectives (the psum the sharded-batch means lower
    # to must cross the process boundary here, standing in for ICI/DCN)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes,
        process_id=process_id,
        initialization_timeout=60,
    )
    assert jax.process_count() == num_processes
    assert jax.device_count() == 8, jax.devices()
    assert jax.local_device_count() == 8 // num_processes

    import numpy as np

    from semantic_pyramid_for_image_generation_tpu.config import (
        PyramidGANConfig,
    )
    from semantic_pyramid_for_image_generation_tpu.data.synthetic import (
        synthetic_batch,
    )
    from semantic_pyramid_for_image_generation_tpu.parallel.mesh import (
        make_mesh,
        shard_batch,
        shard_state,
    )
    from semantic_pyramid_for_image_generation_tpu.train.state import (
        init_train_state,
        make_models,
        make_optimizers,
    )
    from semantic_pyramid_for_image_generation_tpu.train.step import (
        make_train_step,
    )

    cfg = PyramidGANConfig().tiny()
    g_tx, d_tx = make_optimizers(1e-4)
    # deterministic same-seed init on every process == replicated params
    state = init_train_state(jax.random.key(0), cfg, g_tx, d_tx)
    generator, discriminator, vgg = make_models(cfg, False)
    step = make_train_step(generator, discriminator, vgg, g_tx, d_tx,
                           donate=False)

    mesh = make_mesh()  # global: 2 processes x 4 virtual devices
    # the PRODUCTION placement helpers (what Trainer._put / Trainer.__init__
    # call) — multi-process safe via mesh._put_global, which assembles each
    # host-replicated value into a global array from process-local shards
    state = jax.tree.map(np.asarray, state)  # host-side, as a loader would be
    state = shard_state(state, mesh)
    host_batch = synthetic_batch(cfg, 8, np.random.default_rng(0))
    batch = shard_batch(host_batch, mesh)

    with mesh:
        new_state, metrics = step(state, batch, jax.random.key(1))
    host = {k: float(np.asarray(v.addressable_data(0)))
            for k, v in metrics.items()}
    host["step"] = int(np.asarray(new_state.step.addressable_data(0)))

    # process-local feeding (the --multihost production wiring): this process
    # holds only ITS contiguous half of the global batch — exactly what a
    # Places365Loader(num_shards=2, shard_id=process_id) shard emits — and
    # shard_batch(process_local=True) assembles the identical global array,
    # so the step metrics must match the host-replicated feed bit-for-bit.
    half = 8 // num_processes
    local = jax.tree.map(
        lambda x: x[process_id * half:(process_id + 1) * half], host_batch)
    local_batch = shard_batch(local, mesh, process_local=True)
    with mesh:
        _, metrics_local = step(state, local_batch, jax.random.key(1))
    for k, v in metrics_local.items():
        np.testing.assert_array_equal(
            np.asarray(v.addressable_data(0)), host[k],
            err_msg=f"process-local feed diverged on {k}")

    print("METRICS " + json.dumps(host, sort_keys=True), flush=True)
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
