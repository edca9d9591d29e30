"""Auxiliary subsystems: timing, profiling, checkpointing, native bindings."""

from .timer import Timer  # noqa: F401
