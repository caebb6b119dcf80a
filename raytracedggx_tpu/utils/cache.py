"""Persistent XLA compilation cache setup.

The tunneled TPU backend compiles slowly (~100 s for a traversal graph);
caching compiled executables on disk makes every run after the first
start in seconds.  Called by the CLI, bench, and graft entry points —
deliberately not at package import (libraries shouldn't mutate global
config beyond numerical-correctness settings).
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Best-effort: never raises.  A dead/unreachable backend must not take
    the caller down with it (round-1 postmortem: bench.py died inside this
    helper when the TPU tunnel was gone)."""
    import jax

    try:
        # key by backend: reusing CPU AOT entries across machines with
        # different vector ISAs triggers feature-mismatch warnings/SIGILL
        # risk
        backend = jax.default_backend()
    except Exception:
        return  # backend unavailable; skip caching, let the caller surface
        # the real error on first device use
    try:
        path = path or os.environ.get(
            "RTGGX_CACHE_DIR", os.path.expanduser("~/.cache/rtggx-jax"))
        path = os.path.join(path, backend)
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # caching is an optimization, not a requirement
