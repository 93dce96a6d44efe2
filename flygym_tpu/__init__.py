"""flygym-tpu: a TPU-native NeuroMechFly embodied fly simulation framework.

A ground-up reimplementation of the capabilities of NeLy-EPFL/flygym 2.x
designed for TPU hardware: the physics engine is a pure-JAX (XLA-compiled)
pipeline that vmaps over thousands of worlds per chip and shards over device
meshes, instead of wrapping the MuJoCo C engine / MuJoCo-Warp CUDA kernels.

Public API parity reference: flygym ``src/flygym/__init__.py:8-21``.
"""

from pathlib import Path

# The Pallas kernels (ops/megastep.py, ops/ldl_pallas.py,
# ops/retina_pallas.py) need more scoped VMEM than libtpu's 16 MiB default
# (the whole physics step lives in one kernel; its Mosaic value stack is
# 50-100 MiB depending on the model). Each pallas_call sets its own
# per-kernel ``vmem_limit_bytes`` (megastep sizes it from the model via
# ops.megastep._est_scoped_mb) — a process-global LIBTPU flag sized for
# the biggest model measurably slows the smaller kernels, so none is set
# here. Raising ``LIBTPU_INIT_ARGS=--xla_tpu_scoped_vmem_limit_kib=...``
# by hand is still honored for plain-XLA (non-Pallas) programs.

assets_dir = Path(__file__).parent / "assets"

from flygym_tpu import anatomy  # noqa: E402
from flygym_tpu import compose  # noqa: E402

__all__ = [
    "assets_dir",
    "anatomy",
    "compose",
]
__version__ = "0.1.0"


def __getattr__(name):
    # Lazy imports for the heavier simulation/rendering layers so that the
    # light data layers stay importable without pulling in JAX.
    if name == "Simulation":
        from flygym_tpu.simulation import Simulation

        return Simulation
    if name == "BatchSimulation":
        from flygym_tpu.batch import BatchSimulation

        return BatchSimulation
    if name == "Renderer":
        from flygym_tpu.render import Renderer

        return Renderer
    if name in ("launch_interactive_viewer", "preview_model"):
        from flygym_tpu import render

        return getattr(render, name)
    raise AttributeError(f"module 'flygym_tpu' has no attribute {name!r}")
