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
    import jax

    path = path or os.environ.get("RTGGX_CACHE_DIR",
                                  os.path.expanduser("~/.cache/rtggx-jax"))
    # key by backend: reusing CPU AOT entries across machines with
    # different vector ISAs triggers feature-mismatch warnings/SIGILL risk
    path = os.path.join(path, jax.default_backend())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
