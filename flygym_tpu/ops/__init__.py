from flygym_tpu.ops.ldl_pallas import (
    pallas_available,
    tree_ldl_factor_op,
    tree_ldl_solve_op,
)

__all__ = ["tree_ldl_factor_op", "tree_ldl_solve_op", "pallas_available"]
