"""Checkpoint / resume.

Two interoperable formats (SURVEY.md 5 'Checkpoint / resume'):
  * orbax: the full TrainState pytree (params, optimizer slots, spectral u/v,
    BN stats, step) — async-capable, sharding-aware; the native format.
  * torch `.pt`: reference checkpoints (`checkpoint_XXX.pt` with G/D state
    dicts, model_wrapper.py:215-223) import via utils.pt_interop, including
    the torch Adam moments (convert_adam_moments + state.inject_adam_moments)
    so a resumed reference run continues with identical updates.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from semantic_pyramid_for_image_generation_tpu.train.state import TrainState


def save_checkpoint(directory: str, state: TrainState,
                    step: Optional[int] = None) -> str:
    """Save under `<directory>/checkpoint_<step>` (zero-padded like the
    reference's checkpoint_XXX.pt naming)."""
    step = int(state.step) if step is None else step
    path = os.path.abspath(os.path.join(directory, f"checkpoint_{step:03d}"))
    # Fetch to host numpy in ONE device_get before handing to orbax: orbax's
    # internal async copy_to_host futures never complete on the axon TPU
    # relay (observed: a save wrote only metadata, then deadlocked for 50+
    # minutes with every thread futex-parked), while a plain device_get is
    # the one reliable sync primitive on that transport (see bench.py).
    # Host arrays also make orbax's write path fully synchronous, so the
    # checkpoint is durable when this returns.
    host_state = jax.device_get(state)
    with ocp.StandardCheckpointer() as ckptr:
        # force=True: overwrite like the reference's torch.save
        # (model_wrapper.py:215-223) — a retrained epoch or a partial dir
        # left by a crash must not abort the run.
        ckptr.save(path, host_state, force=True)
    return path


def restore_checkpoint(path: str, state_like: TrainState) -> TrainState:
    """Restore into the structure/shardings of `state_like`."""
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, state_like)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), abstract)


def latest_checkpoint(directory: str) -> Optional[str]:
    if not os.path.isdir(directory):
        return None
    entries = [e for e in os.listdir(directory) if e.startswith("checkpoint_")]
    if not entries:
        return None
    entries.sort(key=lambda e: int(e.split("_")[-1]))
    return os.path.join(directory, entries[-1])
