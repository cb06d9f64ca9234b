"""Test harness config: run JAX on CPU with 8 virtual devices.

This is the JAX-native fake multi-chip backend (SURVEY.md §4): sharding
and collective code paths compile and execute on 8 host devices without
TPU hardware. The environment's axon sitecustomize force-registers the
TPU tunnel platform, so we override the platform list in-process too.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

# persistent compile cache for the test suite: the model tests are
# compile-dominated (~minutes of XLA:CPU work that is identical across
# runs on the same machine). Scoped to tests only — the library gates
# its auto-cache to accelerator platforms because CPU AOT artifacts
# don't transfer between machines, which is irrelevant for a local
# cache directory.
_cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu")
try:
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass
