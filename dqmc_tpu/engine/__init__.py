from dqmc_tpu.engine.state import EngineConfig, WalkerState
from dqmc_tpu.engine.sweep import (
    init_state,
    rebuild_stack_and_greens,
    reset_error_stats,
    sweep,
    sweep_pair,
    half_warp,
)

__all__ = [
    "EngineConfig",
    "WalkerState",
    "init_state",
    "rebuild_stack_and_greens",
    "reset_error_stats",
    "sweep",
    "sweep_pair",
    "half_warp",
]
