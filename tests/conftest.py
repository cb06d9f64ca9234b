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
