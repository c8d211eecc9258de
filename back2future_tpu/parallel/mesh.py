"""Mesh construction and sharding placement.

The reference's only model-execution parallelism is single-process
multi-GPU data parallelism with synchronous gradient averaging
(nn.DataParallelTable + syncParameters, util.lua:27-48, train.lua:493-496).
The TPU-native equivalent: batch sharded over a `data` mesh axis, params
replicated, XLA inserting the gradient all-reduce over ICI when the jitted
train step consumes sharded inputs. An optional `spatial` axis shards the
image height dimension; XLA's SPMD partitioner inserts halo exchanges for
the convolutions automatically.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None,
              shape: Sequence[int] = (),
              axes: Sequence[str] = ("data",)) -> Mesh:
    """Build a Mesh; default: all devices on one 'data' axis."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if not shape:
        shape = (len(devices),)
        axes = tuple(axes[:1]) or ("data",)
    return Mesh(devices.reshape(tuple(shape)), tuple(axes))


def batch_sharding(mesh: Mesh, spatial: bool = False) -> NamedSharding:
    """NHWC batch arrays: shard batch dim over 'data' (and H over 'spatial'
    when the mesh has that axis)."""
    if spatial and "spatial" in mesh.axis_names:
        return NamedSharding(mesh, P("data", "spatial", None, None))
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, spatial: bool = False,
                allow_partial: bool = False):
    """Place a pytree of host arrays onto the mesh, batch-sharded.

    A batch whose leading dim does not divide the 'data' axis is only
    legitimate for the final partial validation batch (test.lua:52-64
    improved) — pass ``allow_partial=True`` there and the batch is
    replicated instead (correct, just not parallel for that one batch).
    On the training path a non-divisible batch is a misconfiguration
    (every device would redundantly compute the full batch, silently
    losing the whole data-parallel speedup), so it raises."""
    data_n = mesh.shape.get("data", 1)
    spatial_n = mesh.shape.get("spatial", 1)

    def put(x):
        if x is None:
            return None
        if getattr(x, "ndim", 0) == 0:
            return jax.device_put(x, replicated_sharding(mesh))
        if x.shape[0] % data_n:
            if not allow_partial:
                raise ValueError(
                    f"batch dim {x.shape[0]} does not divide the mesh's "
                    f"'data' axis ({data_n}); pick a batch size that is a "
                    f"multiple of {data_n} (replication fallback is only "
                    f"allowed for partial eval batches, allow_partial=True)")
            return jax.device_put(x, replicated_sharding(mesh))
        spec = [None] * x.ndim
        spec[0] = "data"
        if (spatial and "spatial" in mesh.axis_names and x.ndim >= 2
                and x.shape[1] % spatial_n == 0):
            spec[1] = "spatial"
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh.

    On a multi-host mesh the devices are not all addressable from this
    process, so plain device_put cannot place the array; every host holds
    an identical copy (same seed / same checkpoint), which is exactly the
    contract of make_array_from_process_local_data with a fully-
    replicated sharding."""
    sh = replicated_sharding(mesh)
    if any(d.process_index != jax.process_index()
           for d in mesh.devices.flat):
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), tree)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
