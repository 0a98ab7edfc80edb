from dqmc_tpu.models.attractive_hubbard import AttractiveHubbard, build_kinetic_matrix
from dqmc_tpu.models.repulsive_hubbard import RepulsiveHubbard

# model registry for the driver ([hubbard] model = <name>)
MODEL_REGISTRY = {
    "attractive": AttractiveHubbard,
    "repulsive": RepulsiveHubbard,
}

__all__ = ["AttractiveHubbard", "RepulsiveHubbard", "MODEL_REGISTRY",
           "build_kinetic_matrix"]
