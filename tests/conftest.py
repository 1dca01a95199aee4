"""Test config: run JAX on a virtual 8-device CPU mesh.

The env vars must be set before any backend initializes; this image also
auto-registers a TPU ("axon") PJRT plugin from sitecustomize, which imports
jax before conftest runs — so the platform choice must additionally go
through jax.config, which wins as long as no backend has been used yet.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# persistent compile cache: the DP-kernel scans are expensive to compile on
# the CPU backend; cache them across test runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/npt_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
