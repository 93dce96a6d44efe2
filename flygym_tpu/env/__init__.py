from flygym_tpu.env.gym import FlyEnv, VectorFlyEnv

__all__ = ["FlyEnv", "VectorFlyEnv"]
