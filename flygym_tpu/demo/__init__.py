from flygym_tpu.demo.spotlight import MotionSnippet
from flygym_tpu.demo.benchmark import make_model, run_benchmark, ReplayTargetData

__all__ = ["MotionSnippet", "make_model", "run_benchmark", "ReplayTargetData"]
