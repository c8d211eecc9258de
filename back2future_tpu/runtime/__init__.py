"""Native (C++) runtime components and their build/load machinery.

The TPU compute path is JAX/XLA/Pallas; host-side byte- and thread-level
work (image decode hot loops, prefetch pools) is native C++ compiled on
demand with the system toolchain and loaded via ctypes.
"""

from .native import load_library, native_available

__all__ = ["load_library", "native_available"]
