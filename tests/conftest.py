"""Test configuration: force CPU with an 8-device virtual mesh.

Multi-chip sharding paths (parallel/) are exercised on a virtual CPU mesh via
--xla_force_host_platform_device_count, per the multi-host test strategy in
SURVEY.md §4. The axon TPU plugin ignores JAX_PLATFORMS, so we also set
JAX_PLATFORM_NAME and pin via jax.config before any backend initialises.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"

# persistent compile cache: a warm suite run skips ~all XLA compiles (the
# dominant cost of the compile-heavy system/parallel tests on CPU)
from onepiece_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()
