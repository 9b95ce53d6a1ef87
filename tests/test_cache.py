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


def test_falsy_strings_opt_out(monkeypatch):
    """SPIG_JAX_CACHE=off/false/no must disable, not create a dir named
    'off' (ADVICE r3)."""
    old = jax.config.jax_compilation_cache_dir
    try:
        for value in ("off", "False", "NO", " 0 "):
            jax.config.update("jax_compilation_cache_dir", None)
            monkeypatch.setenv("SPIG_JAX_CACHE", value)
            enable_compilation_cache(default_dir="/tmp/spig-cache-sentinel")
            assert jax.config.jax_compilation_cache_dir is None, value
    finally:
        _restore(old)


def test_truthy_strings_select_default_dir(tmp_path, monkeypatch):
    old = jax.config.jax_compilation_cache_dir
    try:
        for value in ("1", "true", "on", "YES"):
            monkeypatch.setenv("SPIG_JAX_CACHE", value)
            enable_compilation_cache(default_dir=str(tmp_path / "d"))
            assert jax.config.jax_compilation_cache_dir == str(tmp_path / "d")
    finally:
        _restore(old)


def test_min_compile_secs_parameterized(tmp_path, monkeypatch):
    """The test-suite entry point lowers the persistence threshold so its
    sub-5s CPU compiles are persisted (ADVICE r3)."""
    old = jax.config.jax_compilation_cache_dir
    old_secs = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        monkeypatch.delenv("SPIG_JAX_CACHE", raising=False)
        enable_compilation_cache(default_dir=str(tmp_path / "d"),
                                 min_compile_secs=0.5)
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 0.5
    finally:
        _restore(old)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          old_secs)


def test_user_path_failure_warns(monkeypatch):
    """A user-supplied cache path that cannot be created warns instead of
    silently dropping the request (ADVICE r3)."""
    import warnings

    old = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.setenv("SPIG_JAX_CACHE",
                           "/proc/definitely/not/writable/cache")
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            enable_compilation_cache()
        assert any("SPIG_JAX_CACHE" in str(w.message) for w in caught)
    finally:
        _restore(old)
