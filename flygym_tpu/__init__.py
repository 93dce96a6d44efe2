"""flygym-tpu: a TPU-native NeuroMechFly embodied fly simulation framework.

A ground-up reimplementation of the capabilities of NeLy-EPFL/flygym 2.x
designed for TPU hardware: the physics engine is a pure-JAX (XLA-compiled)
pipeline that vmaps over thousands of worlds per chip and shards over device
meshes, instead of wrapping the MuJoCo C engine / MuJoCo-Warp CUDA kernels.

Public API parity reference: flygym ``src/flygym/__init__.py:8-21``.
"""

import os as _os
from pathlib import Path

# The Pallas mega-step kernel (ops/megastep.py) needs a larger scoped-VMEM
# stack than libtpu's 16 MiB default (the whole physics step lives in one
# kernel; a two-fly model with fly-fly contact rows measures ~85 MiB of
# Mosaic value stack + ~16 MiB of double-buffered per-block I/O = 101 MiB
# total at multi-block grids). 112 MiB of the v5e's 128 MiB VMEM; the
# supported-model gate (ops.megastep.megastep_supported) keeps kernels
# under it. Must be set before the TPU backend initializes; appending is
# safe if the flag is already present or no TPU is attached.
_VMEM_FLAG = "--xla_tpu_scoped_vmem_limit_kib=114688"
if "xla_tpu_scoped_vmem_limit_kib" not in _os.environ.get("LIBTPU_INIT_ARGS", ""):
    _os.environ["LIBTPU_INIT_ARGS"] = (
        _os.environ.get("LIBTPU_INIT_ARGS", "") + " " + _VMEM_FLAG
    ).strip()

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
