"""Persistent XLA compilation cache setup.

The tunneled TPU backend compiles slowly (~100 s for a traversal graph);
caching compiled executables on disk makes every run after the first
start in seconds.  Called by the CLI, bench, and graft entry points —
deliberately not at package import (libraries shouldn't mutate global
config beyond numerical-correctness settings).
"""

from __future__ import annotations

import hashlib
import os


def _host_isa_fingerprint() -> str:
    """Short stable hash of this host's CPU feature flags (x86: the
    /proc/cpuinfo `flags` line; other archs: the Features/model lines).
    Two hosts with identical vector ISAs share a fingerprint and may share
    AOT cache entries; any feature difference separates them."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                low = line.lower()
                if low.startswith(("flags", "features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha1(feats.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:12]


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
        key = backend
        if backend == "cpu":
            # CPU AOT executables are ISA-specific: entries compiled on a
            # host with different vector features load but can SIGILL
            # (observed as XLA:CPU feature-mismatch warnings in the round-2
            # multichip gate).  Key the cache path by a fingerprint of this
            # host's CPU feature flags, not just the platform string.
            key = f"cpu-{_host_isa_fingerprint()}"
        path = path or os.environ.get(
            "RTGGX_CACHE_DIR", os.path.expanduser("~/.cache/rtggx-jax"))
        path = os.path.join(path, key)
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # caching is an optimization, not a requirement
