from .checkpoint import load_checkpoint, save_checkpoint
from .profiling import StageTimer, device_trace, timed_call

__all__ = ["save_checkpoint", "load_checkpoint", "StageTimer", "device_trace",
           "timed_call"]
