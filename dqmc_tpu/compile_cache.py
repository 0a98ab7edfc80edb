"""Persistent XLA compilation cache for the heavyweight engine programs.

The df32 parity engine's cold compile is ~11 minutes on the TPU tunnel
(BENCHMARKS.md) and the fused f32 engine's is ~1-2 min per new walker
batch shape; without a persistent cache every process — the CLI driver,
``bench.py``, ``tools/profile_phases.py`` — pays it again.  The reference
has no analogue (C++ compiles once at build time, CMakeLists.txt:7); the
TPU-native equivalent is JAX's persistent compilation cache, which this
module turns on with one call.

The cache is keyed on (HLO, compiler version, device kind), so stale
entries are never served; it is safe to delete the directory at any time.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache", "dqmc_tpu_xla")


def enable(cache_dir: str | None = None) -> str | None:
    """Turn on the persistent compilation cache (idempotent).

    Respects ``DQMC_COMPILE_CACHE``: a path overrides the default
    location, ``0``/``off`` disables caching entirely.  Returns the
    directory in use, or None when disabled/unsupported.
    """
    env = os.environ.get("DQMC_COMPILE_CACHE", "")
    if env.lower() in ("0", "off", "none"):
        return None
    path = cache_dir or (env if env else DEFAULT_DIR)
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took real compile effort; tiny programs
        # recompile faster than they deserialize
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - older jax knob names
        return None
    return path
