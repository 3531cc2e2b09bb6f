from tpu_gpad.utils.timing import device_time_per_call, wall_times

__all__ = ["device_time_per_call", "wall_times"]
