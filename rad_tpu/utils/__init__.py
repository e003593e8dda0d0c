"""Utilities: profiling hooks and checkpointing helpers."""

from rad_tpu.utils.profiling import profile_trace, Timer

__all__ = ["profile_trace", "Timer"]
