"""Multi-host (DCN) initialization and per-host data sharding.

The reference's parallelism stops at single-process multi-GPU
(DataParallelTable, util.lua:27-48). The TPU-native scale-out path is
standard JAX multi-host SPMD: every host runs the same program,
`jax.distributed.initialize` wires the hosts over DCN, the mesh spans all
chips in the slice, and each host feeds only its local shard of the batch
(`host_local_batch` + `make_global_batch` below). Gradient all-reduce
stays on ICI inside the slice; only init/checkpoint coordination crosses
DCN.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Wire up multi-host JAX (no-op for single-process runs).

    With TPU pod environment variables present, bare
    `jax.distributed.initialize()` autodetects everything.

    An explicitly-requested multi-host launch (coordinator address given,
    or pod env vars present) must NOT silently degrade to N independent
    single-host runs — failures re-raise in that case.

    Manual cluster launches (no pod metadata, e.g. CPU hosts over DCN)
    can pass the cluster spec via env vars instead of arguments:
    B2F_COORDINATOR=host:port B2F_NUM_PROCESSES=n B2F_PROCESS_ID=i —
    this is how `python main.py` joins a cluster without new CLI flags."""
    import os

    # NOTE: must not touch the XLA backend before distributed init —
    # jax.process_count()/jax.devices() here would initialize it and
    # make jax.distributed.initialize raise. is_initialized() only
    # inspects distributed-service state.
    if jax.distributed.is_initialized():
        return  # already initialized
    if coordinator_address is None and os.environ.get("B2F_COORDINATOR"):
        coordinator_address = os.environ["B2F_COORDINATOR"]
        try:
            num_processes = int(os.environ["B2F_NUM_PROCESSES"])
            process_id = int(os.environ["B2F_PROCESS_ID"])
        except KeyError as e:
            raise ValueError(
                "B2F_COORDINATOR is set but the cluster spec is "
                f"incomplete (missing {e.args[0]}): a manual launch needs "
                "all three of B2F_COORDINATOR=host:port "
                "B2F_NUM_PROCESSES=n B2F_PROCESS_ID=i") from None
    pod_env = any(os.environ.get(k) for k in
                  ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                   "MEGASCALE_COORDINATOR_ADDRESS"))
    # TPU_WORKER_HOSTNAMES is set (with a single entry) on single-host
    # TPU VMs too; only treat it as a multi-host request when it names
    # more than one worker.
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    multi_worker = len([w for w in workers.split(",") if w.strip()]) > 1
    explicit = coordinator_address is not None or pod_env or multi_worker
    try:
        if coordinator_address is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(coordinator_address, num_processes,
                                       process_id)
    except Exception:
        if explicit:
            raise
        # no cluster was asked for and none detected: stay single-host
        pass


_SYNC_COUNTERS: Dict[str, int] = {}


def _coordination_client():
    try:
        from jax._src import distributed as _dist

        return _dist.global_state.client
    except Exception:
        return None


def sync_hosts(mesh: Mesh, tag: str = "startup") -> None:
    """Align all hosts, then establish the cross-host collective context
    with a trivial all-reduce.

    Rationale: the first collective a cluster executes triggers the
    communicator rendezvous, whose timeout (30 s for XLA:CPU's Gloo) is
    much shorter than a big train-step compile — if hosts reach their
    first step seconds-to-minutes apart (compile skew, import skew), the
    fast host times out. Pairing a coordination-service barrier (long
    timeout) with a sub-second collective creates the communicator while
    the hosts are tightly aligned; the train step then starts from a
    synchronized clock on every host. No-op single-host.

    Every host must call with the SAME sequence of `tag`s (barrier names
    derive from a per-tag counter; asymmetric call counts under one tag
    would strand hosts at different barriers until the 600 s timeout).
    Library callers should pass their own tag rather than reusing the
    train loop's default."""
    if jax.process_count() == 1:
        return
    client = _coordination_client()
    if client is not None:
        # unique id per (tag, call): the coordination service rejects
        # name reuse, and hosts call in lockstep per tag (docstring
        # contract) so the deterministic counter agrees
        n = _SYNC_COUNTERS.get(tag, 0) + 1
        _SYNC_COUNTERS[tag] = n
        client.wait_at_barrier(f"b2f_sync_hosts_{tag}_{n}",
                               timeout_in_ms=600_000)
    ones = np.ones((len(jax.local_devices()), 1), np.float32)
    tot = None
    with mesh:
        tot = jax.jit(lambda v: v.sum())(
            make_global_batch({"x": ones}, mesh)["x"])
    np.asarray(tot)  # device->host fetch = completion barrier


def assert_same_across_hosts(tag: str, value: str,
                             timeout_ms: int = 600_000) -> None:
    """Raise if `value` differs from host 0's value for the same `tag`.

    Used to catch silent cross-host divergence before it corrupts a run —
    e.g. a `-cont` resume where host 0 finds checkpoint model_N on its
    local disk but other hosts fresh-init (checkpoints are written by
    host 0 only; without shared storage the others cannot see them).
    replicate()'s make_array_from_process_local_data contract requires
    identical per-host data, so divergence there would silently assemble
    a corrupt "replicated" array and desynchronize the epoch loops.

    Implemented over the coordination-service KV store (long timeout, no
    collective): every host publishes its value, waits at a barrier, then
    compares against host 0's. No-op single-host. Like sync_hosts, all
    hosts must call with the same sequence of tags."""
    if jax.process_count() == 1:
        return
    client = _coordination_client()
    if client is None:
        return
    pid = jax.process_index()
    # counter in the key too: the KV store rejects re-setting a key, and
    # a second check under the same tag must not read round 1's values
    n = _SYNC_COUNTERS.get(f"same/{tag}", 0) + 1
    _SYNC_COUNTERS[f"same/{tag}"] = n
    client.key_value_set(f"b2f_same/{tag}/{n}/{pid}", value)
    client.wait_at_barrier(f"b2f_same_barrier_{tag}_{n}",
                           timeout_in_ms=timeout_ms)
    if pid == 0:
        # host 0 must fail fast too (its own value trivially matches the
        # reference), otherwise it hangs at the next barrier while the
        # divergent hosts die — and the canonical log never shows why
        for other in range(1, jax.process_count()):
            theirs = client.blocking_key_value_get(
                f"b2f_same/{tag}/{n}/{other}", timeout_ms)
            if theirs != value:
                raise RuntimeError(
                    f"cross-host divergence at {tag!r}: host {other} has "
                    f"{theirs!r} but host 0 has {value!r}. For checkpoint "
                    f"resume this usually means opt.save is not on storage "
                    f"shared by all hosts — every host must see the same "
                    f"checkpoints.")
        return
    ref = client.blocking_key_value_get(f"b2f_same/{tag}/{n}/0", timeout_ms)
    if ref != value:
        raise RuntimeError(
            f"cross-host divergence at {tag!r}: host {pid} has "
            f"{value!r} but host 0 has {ref!r}. For checkpoint resume "
            f"this usually means opt.save is not on storage shared by "
            f"all hosts — every host must see the same checkpoints.")


def host_local_batch_size(global_batch: int) -> int:
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{n} hosts")
    return global_batch // n


def make_global_batch(local_batch: Dict[str, np.ndarray], mesh: Mesh,
                      spatial: bool = False) -> Dict[str, jax.Array]:
    """Assemble a globally-sharded batch from per-host local arrays.

    Each host passes its own local shard; the returned arrays are global
    jax.Arrays laid out batch-major over the mesh's 'data' axis
    (the multi-host generalization of parallel.mesh.shard_batch)."""
    def put(x):
        if x is None:
            return None
        spec = [None] * x.ndim
        spec[0] = "data"
        if spatial and "spatial" in mesh.axis_names and x.ndim >= 2:
            spec[1] = "spatial"
        sharding = NamedSharding(mesh, P(*spec))
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x,
                                                      global_shape)

    return jax.tree_util.tree_map(put, local_batch)
