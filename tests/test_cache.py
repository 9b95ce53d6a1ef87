"""Persistent-compilation-cache enablement (utils/cache.py).

The cache is an operational accelerator only — these tests pin the config
plumbing (env-var override, opt-out, silent failure), not XLA's cache
behavior itself.
"""

import jax

from semantic_pyramid_for_image_generation_tpu.utils.cache import (
    enable_compilation_cache,
)


def _restore(old):
    jax.config.update("jax_compilation_cache_dir", old)


def test_env_dir_override(tmp_path, monkeypatch):
    old = jax.config.jax_compilation_cache_dir
    try:
        target = str(tmp_path / "cache")
        monkeypatch.setenv("SPIG_JAX_CACHE", target)
        enable_compilation_cache()
        assert jax.config.jax_compilation_cache_dir == target
        import os

        assert os.path.isdir(target)  # created eagerly
    finally:
        _restore(old)


def test_opt_out(monkeypatch):
    old = jax.config.jax_compilation_cache_dir
    try:
        sentinel = "/tmp/spig-cache-sentinel-should-not-be-set"
        jax.config.update("jax_compilation_cache_dir", None)
        monkeypatch.setenv("SPIG_JAX_CACHE", "0")
        enable_compilation_cache(default_dir=sentinel)
        assert jax.config.jax_compilation_cache_dir is None
    finally:
        _restore(old)


def test_default_dir_is_repo_local(tmp_path, monkeypatch):
    old = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.delenv("SPIG_JAX_CACHE", raising=False)
        enable_compilation_cache(default_dir=str(tmp_path / "d"))
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "d")
    finally:
        _restore(old)
