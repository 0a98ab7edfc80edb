from dqmc_tpu.measure.context import MeasurementContext, make_context
from dqmc_tpu.measure.manager import MeasurementManager
from dqmc_tpu.measure import observables, transforms

__all__ = [
    "MeasurementContext",
    "make_context",
    "MeasurementManager",
    "observables",
    "transforms",
]
