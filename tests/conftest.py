"""Test harness config: force a virtual 8-device CPU platform.

Multi-device sharding is validated on a host-CPU mesh (the TPU-world answer
to testing multi-chip behavior without a pod slice); real-chip benchmarking
happens in bench.py, not in the test suite.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
