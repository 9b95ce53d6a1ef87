"""Test configuration.

Forces JAX onto the host CPU with 8 virtual devices so every test runs
device-independent and the data-parallel mesh tests exercise real multi-device
sharding without TPU hardware (SURVEY.md 4d).

NOTE: this image's sitecustomize imports jax at interpreter startup (axon TPU
plugin), so the JAX_PLATFORMS env var is latched before conftest runs —
we must switch platforms via jax.config instead. XLA_FLAGS is still read
lazily at first backend initialization, so the virtual device count works.
Thread pools are pinned to 1 (single-core CI host; oversubscribed spin-waits
dominate otherwise).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
        " --xla_cpu_multi_thread_eigen=false intra_op_parallelism_threads=1"
    ).strip()
os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite's wall clock is dominated by
# CPU XLA compiles of the same programs every run; cache hits cut reruns
# substantially. Keys are HLO hashes, so code changes recompile automatically.
# Disable with SPIG_JAX_CACHE=0.
from semantic_pyramid_for_image_generation_tpu.utils.cache import (  # noqa: E402
    enable_compilation_cache,
)

# low threshold: the suite is many small CPU compiles (sub-5s each) — with
# the entry-point default none would persist and reruns would recompile all
enable_compilation_cache(min_compile_secs=0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    try:
        import torch

        torch.set_num_threads(1)
    except ImportError:
        pass
    assert jax.device_count() >= 8, jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
