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

    # cross-host consistency guard: agreeing values pass, diverging
    # values raise on EVERY host — host 0 detects the divergence too
    # (it would otherwise hang at the next barrier while the others die)
    from back2future_tpu.parallel.distributed import assert_same_across_hosts
    assert_same_across_hosts("agree", "same-on-all-hosts")
    try:
        assert_same_across_hosts("diverge", f"host-{pid}-value")
        raise SystemExit(f"host {pid} should have raised on divergence")
    except RuntimeError as e:
        assert "divergence" in str(e), e
    print(f"proc {pid}: global mean {float(total)} ok", flush=True)
""")


_RUN_WORKER = textwrap.dedent("""
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.environ["B2F_REPO"])
    from back2future_tpu.config import Options
    from back2future_tpu.train.loop import run

    root = os.environ["B2F_TOY_ROOT"]
    opt = Options(
        dataset="toy", datasets_dir=os.path.join(root, "datasets"),
        data_root=root, cache=os.path.join(root, "ckpt"),
        expName=os.environ["B2F_EXP"], optimize="pme", frames=3, levels=4,
        compute_dtype="float32", cropHeight=32, cropWidth=64,
        batchSize=2, epochSize=2, nEpochs=2, nDonkeys=0, epochStore=1,
        nGPU=0,
    ).derive(make_dirs=True)
    # run() calls initialize_multihost() itself, which picks the cluster
    # spec up from B2F_COORDINATOR/B2F_NUM_PROCESSES/B2F_PROCESS_ID
    state = run(opt)
    assert jax.process_count() == 2, jax.process_count()
    assert int(state.step) == 4
    print(f"proc {jax.process_index()}: run ok", flush=True)
""")


def _toy_tree(root):
    """Tiny dataset tree (mirrors test_loop.toy_tree, odd val count so
    the partial-batch paths differ between single- and multi-host)."""
    import numpy as np

    from back2future_tpu.data import SampleSpec, write_manifest
    from back2future_tpu.io.png16 import write_png

    (root / "datasets").mkdir()
    rng = np.random.default_rng(0)
    for i in range(1, 9):
        write_png(root / f"img_{i:02d}.png",
                  (rng.random((40, 72, 3)) * 255).astype(np.uint8))
    write_manifest(root / "datasets" / "toy.dat",
                   [SampleSpec("[PATH]/img_%02d.png", None, r, 1)
                    for r in (2, 3, 4, 5, 6)])
    (root / "datasets" / "toy_split.dat").write_text("1\n1\n2\n2\n2\n")


@pytest.mark.skipif(sys.platform != "linux", reason="fork/localhost only")
def test_two_process_run_matches_single_host(tmp_path):
    """`run()` itself on a 2-host cluster (1 CPU device per host): the
    epoch loss trajectory must match a single-process run with the same
    global batch (the slot-seeded loader makes epoch CONTENT identical;
    only all-reduce summation order may differ)."""
    import numpy as np

    from back2future_tpu.utils import SymbolLogger

    _toy_tree(tmp_path)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker_py = tmp_path / "run_worker.py"
    worker_py.write_text(_RUN_WORKER)
    env = {**os.environ,
           "B2F_REPO": str(Path(__file__).resolve().parent.parent),
           "B2F_TOY_ROOT": str(tmp_path),
           "B2F_EXP": "mh",
           "B2F_COORDINATOR": f"127.0.0.1:{port}",
           "B2F_NUM_PROCESSES": "2",
           "JAX_PLATFORMS": "",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=1"}
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [subprocess.Popen([sys.executable, str(worker_py)],
                              env={**env, "B2F_PROCESS_ID": str(i)},
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    try:
        for p in procs:
            # two full-model CPU compiles share this box's single core;
            # under suite-wide contention 600s flakes (seen r4)
            out, _ = p.communicate(timeout=1200)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail(f"run() workers hung; partial output: {outs}")
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert "run ok" in out

    # reference single-process run, same GLOBAL batch, in this process
    from back2future_tpu.config import Options
    from back2future_tpu.train.loop import run

    opt = Options(
        dataset="toy", datasets_dir=str(tmp_path / "datasets"),
        data_root=str(tmp_path), cache=str(tmp_path / "ckpt"),
        expName="sh", optimize="pme", frames=3, levels=4,
        compute_dtype="float32", cropHeight=32, cropWidth=64,
        batchSize=2, epochSize=2, nEpochs=2, nDonkeys=0, epochStore=1,
        nGPU=1,
    ).derive(make_dirs=True)
    state = run(opt)
    assert int(state.step) == 4

    mh = SymbolLogger(tmp_path / "ckpt" / "mh" / "train.log").read()
    sh = SymbolLogger(tmp_path / "ckpt" / "sh" / "train.log").read()
    np.testing.assert_allclose(mh["avg loss (train set)"],
                               sh["avg loss (train set)"],
                               rtol=2e-3, atol=1e-5)
    # host 1 kept a side log; host 0 owns the canonical one
    assert (tmp_path / "ckpt" / "mh" / "train.log.host1").exists()
    # multi-host validation drops the odd remainder sample; single-host
    # evaluates the full split (partial final batch) — both must log
    mh_t = SymbolLogger(tmp_path / "ckpt" / "mh" / "test.log").read()
    sh_t = SymbolLogger(tmp_path / "ckpt" / "sh" / "test.log").read()
    assert len(mh_t["avg loss (test set)"]) == 2
    assert len(sh_t["avg loss (test set)"]) == 2


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
