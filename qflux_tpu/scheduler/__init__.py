from qflux_tpu.scheduler.flow_match import (
    FlowMatchScheduler,
    calculate_shift,
    compute_density_for_timestep_sampling,
    time_shift,
)
from qflux_tpu.scheduler.weighting import bell_weights, half_bell_weights

__all__ = [
    "FlowMatchScheduler",
    "calculate_shift",
    "compute_density_for_timestep_sampling",
    "time_shift",
    "bell_weights",
    "half_bell_weights",
]
