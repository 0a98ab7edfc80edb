from dqmc_tpu.parallel.walkers import make_mesh, shard_walkers, stack_models
from dqmc_tpu.parallel.tempering import replica_exchange, run_parallel_tempering

__all__ = [
    "make_mesh",
    "shard_walkers",
    "stack_models",
    "replica_exchange",
    "run_parallel_tempering",
]
