from dqmc_tpu.ops.linalg import (
    LDR,
    identity_ldr,
    ldr_matrix,
    to_ldr,
    ldr_mul_mat,
    mat_mul_ldr,
    ldr_mul_ldr,
    inv_one_plus_ldr,
    inv_one_plus_ldr_mul_ldr,
    inv_invldr_plus_ldr,
)

__all__ = [
    "LDR",
    "identity_ldr",
    "ldr_matrix",
    "to_ldr",
    "ldr_mul_mat",
    "mat_mul_ldr",
    "ldr_mul_ldr",
    "inv_one_plus_ldr",
    "inv_one_plus_ldr_mul_ldr",
    "inv_invldr_plus_ldr",
]
