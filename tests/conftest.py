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
import subprocess
import sys

# FLYGYM_TPU_TEST_BACKEND=tpu keeps the real TPU backend for the tests in
# tests/tpu/ (marked @pytest.mark.tpu); the default is the 8-virtual-device
# CPU backend. When the flag is unset and the invocation targets ONLY
# tests/tpu, TPU hardware is auto-detected (subprocess probe with a timeout,
# since the axon tunnel can hang) so `pytest tests/tpu` runs rather than
# silently skipping on a TPU box.
_TEST_BACKEND = os.environ.get("FLYGYM_TPU_TEST_BACKEND", "")

if not _TEST_BACKEND:
    _path_args = [a for a in sys.argv[1:] if not a.startswith("-")]
    _only_tpu = bool(_path_args) and all(
        "tests/tpu" in a.replace("\\", "/") for a in _path_args
    )
    if _only_tpu:
        try:
            _probe = subprocess.run(
                [
                    sys.executable,
                    "-c",
                    "import jax; assert any(d.platform == 'tpu' "
                    "for d in jax.devices())",
                ],
                timeout=120,
                capture_output=True,
            )
            _TEST_BACKEND = "tpu" if _probe.returncode == 0 else "cpu"
        except Exception:
            _TEST_BACKEND = "cpu"
    else:
        _TEST_BACKEND = "cpu"

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
