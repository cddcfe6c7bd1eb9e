"""Test configuration: force CPU backend with 8 virtual devices.

Tests exercise the same JAX code paths as TPU, but on an 8-device virtual CPU
mesh so multi-chip sharding logic is testable without hardware.

NOTE: this environment pre-imports jax with ``JAX_PLATFORMS=axon`` (remote
TPU) via a sitecustomize hook, so we must *overwrite* (not setdefault) the
platform before any backend is initialized — otherwise every unjitted op is
a device roundtrip through the TPU tunnel.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass
