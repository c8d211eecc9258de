"""Build-on-demand loader for the C++ runtime components.

Compiles `runtime/src/<name>.cc` into a shared library with g++ the first
time it is requested, caches the artifact next to the sources (keyed by a
source hash), and exposes it through ctypes. Falls back gracefully (callers
check `native_available()`), so pure-Python paths keep working on machines
without a toolchain.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
import warnings
from pathlib import Path
from typing import Optional

_SRC_DIR = Path(__file__).parent / "src"
_BUILD_DIR = Path(__file__).parent / "_build"
_LOCK = threading.Lock()
_CACHE: dict = {}

_CXX = os.environ.get("CXX", "g++")
# B2F_NATIVE_ARCH overrides the -march tuning (e.g. "x86-64-v2" for
# artifacts shared across heterogeneous hosts; "none" drops the flag)
_ARCH = os.environ.get("B2F_NATIVE_ARCH", "native")
_FLAGS = (["-O3"] + ([f"-march={_ARCH}"] if _ARCH != "none" else [])
          + ["-shared", "-fPIC", "-std=c++17", "-fopenmp"])


def _source_hash(paths) -> str:
    h = hashlib.sha256()
    for p in paths:
        h.update(Path(p).read_bytes())
    return h.hexdigest()[:16]


def load_library(name: str, extra_sources=(), extra_flags=()) -> Optional[ctypes.CDLL]:
    """Compile (if needed) and load runtime/src/<name>.cc; None on failure."""
    with _LOCK:
        if name in _CACHE:
            return _CACHE[name]
        src = _SRC_DIR / f"{name}.cc"
        if not src.exists():
            _CACHE[name] = None
            return None
        sources = [src] + [Path(s) for s in extra_sources]
        tag = _source_hash(sources)
        _BUILD_DIR.mkdir(exist_ok=True)
        so_path = _BUILD_DIR / f"{name}-{tag}.so"
        if not so_path.exists():
            cmd = [_CXX, *_FLAGS, *extra_flags, *map(str, sources), "-o", str(so_path)]
            try:
                subprocess.run(cmd, check=True, capture_output=True, text=True)
            except (subprocess.CalledProcessError, FileNotFoundError) as e:
                msg = getattr(e, "stderr", str(e))
                warnings.warn(
                    f"native build of {name} failed (pure-Python fallback "
                    f"stays active): {msg}", RuntimeWarning)
                _CACHE[name] = None
                return None
        try:
            lib = ctypes.CDLL(str(so_path))
        except OSError as e:
            warnings.warn(f"load of {so_path} failed (pure-Python fallback "
                          f"stays active): {e}", RuntimeWarning)
            lib = None
        _CACHE[name] = lib
        return lib


def native_available(name: str) -> bool:
    return load_library(name) is not None
