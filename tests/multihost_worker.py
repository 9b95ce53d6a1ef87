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

    # ---- eval collectives: validate() + one 7x7 grid (VERDICT r3 item 3) --
    # All processes participate in the fid_scan and grid dispatches; only the
    # lead writes artifacts. Ref behavior replaced: DataParallel gather inside
    # frechet_inception_distance.py:86-90 and the grid loop
    # (model_wrapper.py:264-294).
    import os
    import tempfile
    import warnings

    from semantic_pyramid_for_image_generation_tpu.train.loop import Trainer
    from semantic_pyramid_for_image_generation_tpu.utils.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache(min_compile_secs=0.5)  # share inception compiles
    val_batches = [synthetic_batch(cfg, 8, np.random.default_rng(7 + i),
                                   validation=True) for i in range(2)]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # random-backbone FID warning
        trainer = Trainer(
            cfg, training_dataset=[], validation_dataset=val_batches,
            allow_random_fid=True, use_mesh=True,
            save_data_path=tempfile.mkdtemp(prefix=f"mh_eval_{process_id}_"))
    eval_rng = trainer.rng  # validate() splits self.rng; pin for the rerun
    fid = trainer.validate(scan_group=2)
    host["fid"] = float(fid)
    # the on-device statistics reduction must also work on a multi-process
    # mesh (global moment arrays in, one replicated scalar out) and agree
    # with the host f64 reduction on identical fakes (same rng)
    trainer.rng = eval_rng
    trainer.fid_evaluator.device_statistics = True
    fid_dev = trainer.validate(scan_group=2)
    trainer.fid_evaluator.device_statistics = False
    np.testing.assert_allclose(fid_dev, fid, rtol=1e-3, atol=1e-3)
    host["fid_device_stats"] = float(fid_dev)
    grid_path = trainer.inference(num_images=2)
    if jax.process_index() == 0:
        assert grid_path is not None and os.path.isfile(grid_path), grid_path

    print("METRICS " + json.dumps(host, sort_keys=True), flush=True)
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
