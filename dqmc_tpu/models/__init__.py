from dqmc_tpu.models.attractive_hubbard import AttractiveHubbard, build_kinetic_matrix

__all__ = ["AttractiveHubbard", "build_kinetic_matrix"]
