"""Real multi-process DCN test: two OS processes form a JAX distributed
cluster over localhost and run a psum'd train-like step on a global mesh.

This is the closest a single machine gets to the pod scale-out path
(parallel/distributed.py): each process contributes its local CPU
devices, `initialize_multihost` wires the cluster (the explicit-
coordinator branch), `make_global_batch` assembles per-host shards into
a global array, and a jitted global-mean reduction must agree with the
local NumPy result. Reference analog: there is none — the reference
stops at single-process multi-GPU (util.lua:27-48); this validates the
capability the TPU rebuild adds on top.
"""

import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.environ["B2F_REPO"])
    from back2future_tpu.parallel import (initialize_multihost,
                                          make_global_batch, make_mesh)

    coord = os.environ["B2F_COORD"]
    pid = int(os.environ["B2F_PROC_ID"])
    initialize_multihost(coordinator_address=coord, num_processes=2,
                         process_id=pid)
    assert jax.process_count() == 2, jax.process_count()

    mesh = make_mesh()  # all devices across both processes, axis 'data'
    n_local = len(jax.local_devices())
    # per-host local shard: value == global batch index, so the global
    # mean is checkable from either process
    local = np.arange(n_local, dtype=np.float32)[:, None] + pid * n_local
    batch = make_global_batch({"x": np.tile(local, (1, 4))}, mesh)
    assert batch["x"].shape == (2 * n_local, 4)

    with mesh:
        total = jax.jit(lambda x: x.mean())(batch["x"])
    expect = (2 * n_local - 1) / 2.0
    np.testing.assert_allclose(np.asarray(total), expect, rtol=1e-6)
    print(f"proc {pid}: global mean {float(total)} ok", flush=True)
""")


@pytest.mark.skipif(sys.platform != "linux", reason="fork/localhost only")
def test_two_process_cluster(tmp_path):
    with socket.socket() as s:  # free localhost port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    worker_py = tmp_path / "worker.py"
    worker_py.write_text(_WORKER)
    env = {**os.environ,
           "B2F_REPO": str(Path(__file__).resolve().parent.parent),
           "B2F_COORD": coord,
           "JAX_PLATFORMS": "",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=2"}
    # the axon sitecustomize registers a PJRT plugin at interpreter
    # startup when this is set, which would initialize the backend
    # before jax.distributed.initialize may run
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [subprocess.Popen([sys.executable, str(worker_py)],
                              env={**env, "B2F_PROC_ID": str(i)},
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail(f"distributed workers hung; partial output: {outs}")
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert "ok" in out
