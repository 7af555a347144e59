"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's CI strategy of functional tests on plain CPUs
(SURVEY.md §4): numeric kernels are validated on the CPU backend, and
multi-chip sharding is exercised via xla_force_host_platform_device_count.

Note: this image's sitecustomize force-registers the axon TPU platform via
jax.config.update("jax_platforms", ...), which overrides the JAX_PLATFORMS
env var — so we must update the config back to CPU here, before any
backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# Persistent compilation cache: this box has 2 vCPUs and XLA compiles of
# even tiny kernels cost ~0.5s each; caching makes repeat test runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax

jax.config.update("jax_platforms", "cpu")
