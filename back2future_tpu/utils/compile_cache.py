"""Persistent XLA compilation-cache setup for every CLI entry point.

Through the TPU relay a full-model XLA compile costs 5-8 minutes and the
environment ships no persistent cache, so every process restart repaid
the full compile (the reference's analog cost — Torch/cudnn autotune —
was seconds, README.md:23-33). jax's persistent compilation cache was
verified working through the relay: serialized executables round-trip
and a fresh process gets a cache hit (XLA "compile" in ~1 ms instead of
minutes). ``enable_compile_cache()`` turns it on process-wide.

Policy:
  * default cache dir: ``<repo>/.cache/xla`` (git-ignored, stays inside
    the repo tree);
  * ``B2F_COMPILE_CACHE=<dir>`` overrides the location;
  * ``B2F_COMPILE_CACHE=0`` disables;
  * jax's own defaults decide what is worth caching (min compile time
    1 s — full-model executables, not per-op trivia), and cache keys
    include jaxlib version + compile options, so stale hits are not a
    correctness risk.

jax latches a per-process "cache checked" flag at the first compile, so
enabling a directory after any compile has happened would silently do
nothing — enable_compile_cache therefore resets jax's cache state after
pointing it at the directory, making it effective whenever it is called.
"""

from __future__ import annotations

import os
from pathlib import Path

_OFF = ("0", "false", "no", "off")


def default_cache_dir() -> Path:
    return Path(__file__).resolve().parent.parent.parent / ".cache" / "xla"


def enable_compile_cache(cache_dir: str | os.PathLike | None = None) -> str | None:
    """Point jax's persistent compilation cache at a directory.

    Returns the directory enabled, or None when disabled via
    ``B2F_COMPILE_CACHE=0``. Idempotent.
    """
    env = os.environ.get("B2F_COMPILE_CACHE", "").strip()
    if env.lower() in _OFF:
        return None
    if cache_dir is None:
        cache_dir = env or default_cache_dir()
    path = Path(cache_dir)
    path.mkdir(parents=True, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", str(path))
    # jax latches _cache_checked at the first compile of the process;
    # reset so the new directory takes effect even if something already
    # compiled (e.g. library users enabling the cache mid-session)
    try:
        from jax.experimental.compilation_cache import compilation_cache as _cc
    except ImportError:  # pragma: no cover - moved in some jax versions
        from jax._src import compilation_cache as _cc
    _cc.reset_cache()
    return str(path)
