"""Test configuration.

Tests run on the CPU backend with 8 virtual XLA devices so that multi-chip
sharding paths are exercised without TPU hardware (the same strategy the
reference uses to keep GPU-required tests out of CI — flygym
``.github/workflows/tests.yml:9-33`` runs core tests CPU-only).

This must run before any jax computation. Note the environment may inject a
TPU backend via sitecustomize (axon); we both set the env vars and force the
platform through jax.config, which wins as long as no backend has been
initialized yet.
"""

import os

# FLYGYM_TPU_TEST_BACKEND=tpu keeps the real TPU backend for the tests in
# tests/tpu/ (marked @pytest.mark.tpu); the default is the 8-virtual-device
# CPU backend.
_TEST_BACKEND = os.environ.get("FLYGYM_TPU_TEST_BACKEND", "cpu")

if _TEST_BACKEND == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if _TEST_BACKEND == "cpu":
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the physics step traces to a large program
# (tree-LDL levels, Newton iterations); caching compiled executables across
# test runs cuts suite time dramatically.
jax.config.update("jax_compilation_cache_dir", "/tmp/flygym_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
