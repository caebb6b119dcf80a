"""Test config: force CPU with 8 virtual devices (the 'WARP analog' —
SURVEY.md §4) so multi-chip sharding tests run without a TPU pod."""

import os

# The ambient environment pins JAX_PLATFORMS=axon (the tunneled TPU), so a
# plain env override is not enough — set the config explicitly before any
# backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the suite is compile-bound on this 1-core box
# (VERDICT round-1 weak item 4) — warm runs skip every XLA compile
from raytracedggx_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REF_ASSETS = "/root/reference/Bin/Assets"


@pytest.fixture(scope="session")
def bunny_path():
    p = os.path.join(REF_ASSETS, "bunny.obj")
    if not os.path.exists(p):
        pytest.skip("reference assets unavailable")
    return p


@pytest.fixture(scope="session")
def env_dds_path():
    p = os.path.join(REF_ASSETS, "rnl_cross.dds")
    if not os.path.exists(p):
        pytest.skip("reference assets unavailable")
    return p


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
