from flygym_tpu.control.cpg import (
    CPGNetwork,
    CPGState,
    CPGController,
    extract_preprogrammed_steps,
    tripod_phase_biases,
)
from flygym_tpu.control.hybrid import HybridController, HybridState
from flygym_tpu.control.taxis import VisualTaxisController, object_azimuth_drive

__all__ = [
    "CPGNetwork",
    "CPGState",
    "CPGController",
    "extract_preprogrammed_steps",
    "tripod_phase_biases",
    "HybridController",
    "HybridState",
    "VisualTaxisController",
    "object_azimuth_drive",
]
