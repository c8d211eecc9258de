"""Shared utilities: logging, timing."""

from .logger import SymbolLogger, TeeLogger
from .timing import StepTimer, maybe_profile

__all__ = ["SymbolLogger", "TeeLogger", "StepTimer", "maybe_profile"]
