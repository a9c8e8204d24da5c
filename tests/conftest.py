"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The image's sitecustomize force-registers the TPU ("axon") backend and sets
# JAX_PLATFORMS=axon; an in-process config update is the reliable override.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the suite's cost is dominated by ~200 CPU jit
# compiles (the pipeline gates re-compile large tracking/BA programs); cache
# entries are keyed on jaxpr+flags so re-runs and xdist workers share them.
_cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/ccm_slam_tpu_jaxcache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
except Exception:
    pass  # older jax without the persistent cache
