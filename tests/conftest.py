"""Test configuration.

Tests run on the CPU backend with 8 virtual XLA devices so that multi-chip
sharding paths are exercised without TPU hardware (the same strategy the
reference uses to keep GPU-required tests out of CI — flygym
``.github/workflows/tests.yml:9-33`` runs core tests CPU-only).

This must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
