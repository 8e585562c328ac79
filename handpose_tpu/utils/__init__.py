"""Shared utilities: logging, timers, visualization."""

from .logging import RunLogger, StepStats, Timer, make_run_dir
from .device_info import (get_device_info, get_device_utilization_as_string,
                          profile_trace)

__all__ = ["RunLogger", "StepStats", "Timer", "make_run_dir",
           "get_device_info", "get_device_utilization_as_string",
           "profile_trace"]
