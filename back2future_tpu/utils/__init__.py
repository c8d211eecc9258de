"""Shared utilities: logging, timing, compile cache."""

from .compile_cache import enable_compile_cache
from .logger import SymbolLogger, TeeLogger
from .timing import StepTimer, maybe_profile

__all__ = ["SymbolLogger", "TeeLogger", "StepTimer", "maybe_profile",
           "enable_compile_cache"]
