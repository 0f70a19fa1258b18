"""Persistent XLA compilation cache setup.

First compiles over the remote TPU relay cost 1-4 minutes per program
(CLAUDE.md); round 2's driver bench timed out purely on cold compiles.
Every benchmark / CLI entry point calls :func:`enable` so repeat runs of
the same program hit the on-disk cache instead of recompiling.

The cache is keyed on (program HLO, jax/XLA version, device kind), so it
is safe to share one directory between CPU smoke runs and TPU runs.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)

_enabled = False


def enable(cache_dir: str | None = None) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Idempotent; returns the cache directory in use. Honors the
    ``WMZ_COMPILATION_CACHE`` env var (set to ``0``/``off`` to disable,
    or to a path to relocate the cache).
    """
    global _enabled
    env = os.environ.get("WMZ_COMPILATION_CACHE", "")
    if env.lower() in ("0", "off", "false", "no"):
        return ""
    path = cache_dir or (env if env else _DEFAULT_DIR)
    if _enabled:
        return path
    os.makedirs(path, exist_ok=True)

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # Cache everything: relay compiles are expensive even when XLA's own
        # compile time is short, so don't let the default 1s/small-entry
        # thresholds skip entries.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # pragma: no cover - older jax without these flags
        return ""
    _enabled = True
    return path
