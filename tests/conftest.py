"""Test harness config: force a virtual 8-device CPU platform.

Multi-device sharding is validated on a host-CPU mesh (the TPU-world answer
to testing multi-chip behavior without a pod slice); real-chip benchmarking
happens in bench.py, not in the test suite.
"""

import os

# Force override: the shell environment may pin JAX_PLATFORMS to a real
# accelerator (e.g. a tunneled TPU); unit tests must be hermetic on CPU.
# NOTE: an env var is NOT enough here — a sitecustomize-registered PJRT
# plugin may have already called jax.config.update("jax_platforms", ...)
# at interpreter startup, which shadows the env var. Re-update the config
# explicitly (backends initialize lazily, so this wins as long as no jnp
# op has run yet).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeat test runs skip recompilation.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/b2f-jax-cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
