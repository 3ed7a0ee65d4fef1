"""Persistent XLA compilation cache for generation/training entry points.

The full-depth roster run (benchmarks/mini_pegaset_fulldepth.json) showed
that one-time JIT compiles dominate the first scene of every (mode,
n_objects) shape class: scene 3's 210 s wall was ~130 s of XLA compile
against a ~20 s steady state.  The reference pays its analogous one-time
cost (CUDA extension build) once per install; JAX can do the same by
persisting compiled executables across processes, so repeat runs — the
production case for a dataset generator that is resumable per scene —
skip straight to steady state.

Enabled by default at every generation/bench/training entry.  Control via
``PEGASUS_TPU_COMPILE_CACHE``: ``0`` disables, any other value relocates
the cache directory (default ``~/.cache/pegasus_tpu/xla``).

Reference context: the reference has no analogue (torch extensions are
compiled at pip-install time, reference submodules README); this is the
TPU-native equivalent of that install-time amortization.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "pegasus_tpu", "xla"
)
_enabled = False


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a writable directory.

    Idempotent; safe to call from every entry point.  Returns the cache
    directory in use, or None when disabled (``PEGASUS_TPU_COMPILE_CACHE=0``
    or an unwritable directory).  Only compiles slower than 2 s are
    persisted — steady-state dispatch is never IO-taxed.
    """
    global _enabled
    if _enabled:
        return None
    _enabled = True  # one attempt per process, even on failure
    env = os.environ.get("PEGASUS_TPU_COMPILE_CACHE", "")
    if env == "0":
        return None
    cache_dir = path or (env if env not in ("", "1") else None) or _DEFAULT_DIR
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        return None  # cache is an optimization, never a failure mode
    return cache_dir
