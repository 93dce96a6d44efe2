"""Model composition layer: build flies and worlds, compile to device arrays.

Imports are lazy so that the pure data layers (anatomy, pose, physics params)
remain importable without the full composition stack.
"""

_LAZY = {
    "Fly": "flygym_tpu.compose.fly",
    "ActuatorType": "flygym_tpu.compose.fly",
    "MeshType": "flygym_tpu.compose.fly",
    "GeomFittingOption": "flygym_tpu.compose.fly",
    "BaseWorld": "flygym_tpu.compose.world",
    "FlatGroundWorld": "flygym_tpu.compose.world",
    "TetheredWorld": "flygym_tpu.compose.world",
    "HeightfieldTerrainWorld": "flygym_tpu.compose.world",
    "BlocksTerrainWorld": "flygym_tpu.compose.world",
    "GappedTerrainWorld": "flygym_tpu.compose.world",
    "KinematicPose": "flygym_tpu.compose.pose",
    "KinematicPosePreset": "flygym_tpu.compose.pose",
    "ContactParams": "flygym_tpu.compose.physics",
    "BaseCompositionElement": "flygym_tpu.compose.base",
}

__all__ = list(_LAZY)


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module = importlib.import_module(_LAZY[name])
        return getattr(module, name)
    raise AttributeError(f"module 'flygym_tpu.compose' has no attribute {name!r}")
