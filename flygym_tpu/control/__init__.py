from flygym_tpu.control.cpg import (
    CPGNetwork,
    CPGState,
    CPGController,
    extract_preprogrammed_steps,
    tripod_phase_biases,
)
from flygym_tpu.control.hybrid import HybridController, HybridState

__all__ = [
    "CPGNetwork",
    "CPGState",
    "CPGController",
    "extract_preprogrammed_steps",
    "tripod_phase_biases",
    "HybridController",
    "HybridState",
]
