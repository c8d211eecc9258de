"""Mesh/sharding and multi-host helper tests (single-process CPU mesh)."""

import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from back2future_tpu.parallel import (
    batch_sharding, host_local_batch_size, make_global_batch, make_mesh,
    replicate, shard_batch,
)


class TestMesh:
    def test_default_mesh_all_devices(self):
        mesh = make_mesh()
        assert mesh.devices.size == jax.device_count()
        assert mesh.axis_names == ("data",)

    def test_2d_mesh(self):
        mesh = make_mesh(jax.devices()[:8], shape=(4, 2),
                         axes=("data", "spatial"))
        assert mesh.shape == {"data": 4, "spatial": 2}

    def test_shard_batch_layout(self):
        mesh = make_mesh(jax.devices()[:8])
        batch = {"images": np.zeros((8, 16, 32, 9), np.float32),
                 "mask": np.zeros((8, 16, 32), np.float32)}
        out = shard_batch(batch, mesh)
        assert out["images"].sharding.spec[0] == "data"
        assert all(s is None for s in out["images"].sharding.spec[1:])
        assert out["images"].addressable_shards[0].data.shape[0] == 1

    def test_replicate(self):
        mesh = make_mesh(jax.devices()[:4])
        tree = {"w": np.ones((3, 3), np.float32)}
        out = replicate(tree, mesh)
        assert len(out["w"].addressable_shards) == 4
        for s in out["w"].addressable_shards:
            assert s.data.shape == (3, 3)


class TestMultiHost:
    def test_local_batch_size_single_host(self):
        assert host_local_batch_size(8) == 8 // jax.process_count()

    def test_local_batch_not_divisible(self):
        if jax.process_count() == 1:
            assert host_local_batch_size(7) == 7
        else:
            with pytest.raises(ValueError):
                host_local_batch_size(7)

    def test_make_global_batch_single_host(self):
        mesh = make_mesh(jax.devices()[:8])
        local = {"images": np.arange(8 * 4 * 4 * 3, dtype=np.float32)
                 .reshape(8, 4, 4, 3)}
        out = make_global_batch(local, mesh)
        assert out["images"].shape == (8, 4, 4, 3)
        np.testing.assert_array_equal(np.asarray(out["images"]),
                                      local["images"])
