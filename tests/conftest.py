"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip shardings are validated without TPU hardware by forcing the host
platform and 8 virtual devices (SURVEY.md §4: the reference has no
multi-device tests at all; here mesh tests are first-class).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402  (import after env is set)

# The hosting environment force-registers a remote TPU platform and
# overrides JAX_PLATFORMS at import time; pin the config back to CPU so
# tests run on the local virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
