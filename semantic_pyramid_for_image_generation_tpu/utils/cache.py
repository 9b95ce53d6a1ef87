"""Persistent XLA compilation cache.

Full-width 256x256 programs take minutes of host-side compile on this class
of host (OPTIM.md measures ~5-6 min for bench.py's fused step incl. compile);
the programs themselves are identical run-to-run, so the persistent cache
turns every rerun of bench.py / cli.main into a cache hit. Purely an
operational accelerator: cache keys are HLO+config hashes, so a code change
that alters the program recompiles automatically.

Enabled by default for the CLI and bench entry points; disable with
SPIG_JAX_CACHE=0 (also: false/off/no), or point SPIG_JAX_CACHE at a custom
directory. Failure to enable (old jax, read-only checkout, exotic backend) is
silently ignored for the default path — the cache is an optimization, never a
correctness dependency — but a user-supplied SPIG_JAX_CACHE path that cannot
be applied emits a warning instead of silently dropping the request.
"""

from __future__ import annotations

import os

_FALSY = {"0", "false", "off", "no"}
_TRUTHY = {"1", "true", "on", "yes"}


def _default_cache_dir() -> str:
    """The repo-checkout `.jax_cache` when this module lives in a checkout,
    else a per-user cache dir (a pip-installed package must not drop
    `.jax_cache` next to site-packages)."""
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if os.path.isfile(os.path.join(repo, "pyproject.toml")):
        return os.path.join(repo, ".jax_cache")
    base = os.environ.get("XDG_CACHE_HOME",
                          os.path.join(os.path.expanduser("~"), ".cache"))
    return os.path.join(base, "spig-jax")


def enable_compilation_cache(default_dir: str | None = None,
                             min_compile_secs: float = 5.0) -> None:
    """`min_compile_secs` filters what gets persisted: entry points keep the
    5 s default (skip tiny eval-helper jits); the test suite passes a lower
    threshold so its many small CPU compiles are cache hits on rerun."""
    raw = os.environ.get("SPIG_JAX_CACHE", "")
    if raw.strip().lower() in _FALSY:
        return
    user_dir = raw if raw and raw.strip().lower() not in _TRUTHY else None
    cache_dir = user_dir or default_dir or _default_cache_dir()
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        # thresholds first, directory last: setting the dir is what arms the
        # cache, so a partial failure on old jax leaves it fully off rather
        # than enabled with default thresholds
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception as exc:  # noqa: BLE001 - optional accelerator
        if user_dir is not None:
            import warnings

            warnings.warn(
                f"SPIG_JAX_CACHE={raw!r}: could not enable the XLA "
                f"compilation cache at {cache_dir!r} ({exc})", stacklevel=2)
