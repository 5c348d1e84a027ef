from .metrics import MetricsLogger, point_to_surface_rmse, trajectory_ate
from .profiling import trace, device_time, compiled_flops

__all__ = [
    "MetricsLogger", "point_to_surface_rmse", "trajectory_ate",
    "trace", "device_time", "compiled_flops",
]
