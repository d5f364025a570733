"""Persistent XLA compilation cache.

The remat study (docs/PERF_NOTES.md) found ``remat="none"`` is the fastest
step mode (+8-12%) but compiles ~8× slower (699 s cold) — unusable without
a warm cache. Enabling JAX's persistent compilation cache amortises every
cold compile across processes: the second run of any bench/train config
loads the executable from disk instead of re-running XLA.

The reference has no counterpart (PyTorch eager has no compile step); this
is TPU-native operational plumbing, on by default in the bench and the
predictor trainers.
"""

from __future__ import annotations

import os

_ENABLED = False

DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "qtm_xla_cache"
)


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX at an on-disk compilation cache (idempotent).

    Directory precedence: explicit arg > ``QTM_COMPILE_CACHE`` env >
    ``~/.cache/qtm_xla_cache``. Set ``QTM_COMPILE_CACHE=off`` to disable.
    Returns the cache dir, or None when disabled/unavailable.
    """
    global _ENABLED
    env = os.environ.get("QTM_COMPILE_CACHE", "")
    if env.lower() in ("off", "0", "none", "disabled"):
        return None
    cache_dir = cache_dir or env or DEFAULT_DIR
    if _ENABLED:
        return cache_dir
    try:
        import jax

        if jax.default_backend() == "cpu":
            # CPU executables are AOT-compiled against the *compiling*
            # host's machine features; reloading them on a host whose
            # feature set differs (VM feature masking) risks SIGILL —
            # XLA:CPU warns exactly this when the virtual-mesh dryrun
            # reloads cached entries. CPU compiles are cheap; cache only
            # accelerator (TPU) programs, where the cache exists to
            # amortise minutes-long scan compiles.
            return None
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything that took XLA >1 s — the graph scan programs
        # here compile in minutes, tiny test jits stay uncached
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _ENABLED = True
        return cache_dir
    except Exception as e:  # unsupported backend/flag set — run uncached
        print(f"persistent compilation cache unavailable: {e}")
        return None
