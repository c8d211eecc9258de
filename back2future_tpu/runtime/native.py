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
import sysconfig
import threading
from pathlib import Path
from typing import Optional

_SRC_DIR = Path(__file__).parent / "src"
_BUILD_DIR = Path(__file__).parent / "_build"
_LOCK = threading.Lock()
_CACHE: dict = {}

_CXX = os.environ.get("CXX", "g++")
_FLAGS = ["-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", "-fopenmp"]


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
                print(f"[back2future_tpu.runtime] native build of {name} failed: {msg}")
                _CACHE[name] = None
                return None
        try:
            lib = ctypes.CDLL(str(so_path))
        except OSError as e:
            print(f"[back2future_tpu.runtime] load of {so_path} failed: {e}")
            lib = None
        _CACHE[name] = lib
        return lib


def native_available(name: str) -> bool:
    return load_library(name) is not None
