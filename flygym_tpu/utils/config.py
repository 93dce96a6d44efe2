"""Physics-options configuration files.

Parity reference: flygym ``utils/mjcf.py:10-43`` (``set_mujoco_globals``
recursively applies a YAML of global MJCF parameters). The TPU analog applies
a YAML/JSON document onto a :class:`ModelSpec`'s options: physics globals
(timestep, gravity, solver settings) plus free-form extras stored for
downstream consumers.
"""

import json
from os import PathLike
from pathlib import Path

import yaml

__all__ = ["apply_physics_options", "DEFAULT_PHYSICS_OPTIONS"]

# The compiled defaults mirror the reference's mujoco_globals.yaml:
# timestep 1e-4 s, gravity (0, 0, -9810) mm/s^2.
DEFAULT_PHYSICS_OPTIONS = {
    "timestep": 1e-4,
    "gravity": (0.0, 0.0, -9810.0),
    "solver": "newton",
    "solver_iterations": 3,
}

_KNOWN = {
    "timestep": float,
    "gravity": tuple,
    "solver": str,
    "solver_iterations": int,
    "solver_exact": bool,
    "differentiable": bool,
    "solver_relaxation": float,
    "ncon_max": int,
}


def apply_physics_options(spec, config: "PathLike | dict") -> dict:
    """Apply a physics-options document to a ModelSpec.

    Accepts a YAML/JSON path or a dict. Recognized keys update
    ``spec.options`` (typed); an ``option`` sub-document is flattened
    (mujoco_globals-style layout); unknown keys are preserved under
    ``spec.options['extra']`` for downstream consumers.

    Returns the dict of applied options.
    """
    if not isinstance(config, dict):
        path = Path(config)
        with open(path) as f:
            config = (
                json.load(f) if path.suffix == ".json" else yaml.safe_load(f)
            )

    flat = dict(config)
    # mujoco_globals-style nesting: hoist the "option" block.
    option_block = flat.pop("option", None)
    if isinstance(option_block, dict):
        for key, value in option_block.items():
            flat.setdefault(key, value)

    applied = {}
    extra = {}
    for key, value in flat.items():
        if key in _KNOWN:
            caster = _KNOWN[key]
            value = caster(value) if caster is not tuple else tuple(value)
            spec.options[key] = value
            applied[key] = value
        elif key == "solver" or key == "integrator":
            continue  # integrator is always semi-implicit Euler
        else:
            extra[key] = value
    if extra:
        spec.options.setdefault("extra", {}).update(extra)
    return applied
