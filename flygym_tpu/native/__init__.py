from flygym_tpu.native.meshtools import (
    capsule_fit,
    load_stl,
    mass_properties,
    native_available,
)

__all__ = ["load_stl", "mass_properties", "capsule_fit", "native_available"]
