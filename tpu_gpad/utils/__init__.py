from tpu_gpad.utils.timing import device_time_per_call, wall_times
from tpu_gpad.utils.debug import solve_batch_checked, validate_data

__all__ = [
    "device_time_per_call",
    "wall_times",
    "solve_batch_checked",
    "validate_data",
]
