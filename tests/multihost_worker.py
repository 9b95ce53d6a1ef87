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
        batch_sharding,
        make_mesh,
        replicated_sharding,
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
    b_sh = batch_sharding(mesh)
    r_sh = replicated_sharding(mesh)

    # full host-side value -> global array (each process contributes its
    # addressable slice; global_shape marks the data as host-replicated)
    def to_global(x, sharding):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape=x.shape)

    state = jax.tree.map(lambda x: to_global(x, r_sh), state)
    host_batch = synthetic_batch(cfg, 8, np.random.default_rng(0))
    batch = jax.tree.map(lambda x: to_global(x, b_sh), host_batch)

    with mesh:
        new_state, metrics = step(state, batch, jax.random.key(1))
    host = {k: float(np.asarray(v.addressable_data(0)))
            for k, v in metrics.items()}
    host["step"] = int(np.asarray(new_state.step.addressable_data(0)))
    print("METRICS " + json.dumps(host, sort_keys=True), flush=True)
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
