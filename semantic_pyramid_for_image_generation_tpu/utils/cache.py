"""Persistent XLA compilation cache.

Full-width 256x256 programs take minutes of host-side compile on this class
of host (OPTIM.md measures ~5-6 min for bench.py's fused step incl. compile);
the programs themselves are identical run-to-run, so the persistent cache
turns every rerun of bench.py / cli.main into a cache hit. Purely an
operational accelerator: cache keys are HLO+config hashes, so a code change
that alters the program recompiles automatically.

Enabled by default for the CLI and bench entry points; disable with
SPIG_JAX_CACHE=0, or point SPIG_JAX_CACHE at a custom directory. Failure to
enable (old jax, read-only checkout, exotic backend) is silently ignored —
the cache is an optimization, never a correctness dependency.
"""

from __future__ import annotations

import os


def enable_compilation_cache(default_dir: str | None = None) -> None:
    raw = os.environ.get("SPIG_JAX_CACHE", "")
    if raw == "0":
        return
    if raw and raw != "1":
        cache_dir = raw
    else:
        if default_dir is None:
            default_dir = os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))), ".jax_cache")
        cache_dir = default_dir
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # only programs worth caching (skip tiny eval-helper jits)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
