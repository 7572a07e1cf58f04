"""Test env: force an 8-device virtual CPU mesh before jax initializes.

SURVEY.md §4 "Distributed without a cluster": the same shard_map code path
runs on 1 chip, N virtual CPU devices, and multi-host unchanged.
"""

import os

# Force CPU: the session env presets JAX_PLATFORMS=axon (the real-TPU
# tunnel); tests must run on the local virtual 8-device CPU mesh instead.
# RTRT_TEST_TPU=1 opts OUT of the CPU override so the on-hardware suite
# (tests/test_tpu_native.py) can run against the real chip.
_TPU = os.environ.get("RTRT_TEST_TPU", "") == "1"
if not _TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The image's sitecustomize registers the axon TPU plugin before conftest
# runs, so the env var alone is too late — override via config too.
if not _TPU:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compilation cache: XLA CPU compiles of the full pipeline are
# slow; cache them across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/rtrt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
