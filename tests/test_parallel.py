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

    def test_shard_batch_partial_raises_on_train_path(self):
        mesh = make_mesh(jax.devices()[:8])
        batch = {"images": np.zeros((6, 8, 8, 9), np.float32)}
        with pytest.raises(ValueError, match="does not divide"):
            shard_batch(batch, mesh)

    def test_shard_batch_partial_replicates_for_eval(self):
        mesh = make_mesh(jax.devices()[:8])
        batch = {"images": np.zeros((6, 8, 8, 9), np.float32)}
        out = shard_batch(batch, mesh, allow_partial=True)
        assert all(s is None for s in out["images"].sharding.spec)
        assert out["images"].addressable_shards[0].data.shape[0] == 6

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


class TestConsistencyGuard:
    def test_single_host_noop(self):
        from back2future_tpu.parallel.distributed import (
            assert_same_across_hosts)

        # single-process: must be a silent no-op whatever the value
        assert_same_across_hosts("t", "anything")

    def test_fingerprint_stable_and_sensitive(self):
        from back2future_tpu.train.loop import _state_fingerprint

        params = {"a": np.ones((2, 3), np.float32),
                  "b": {"w": np.arange(4, dtype=np.float32)}}
        fp1 = _state_fingerprint(params, 3)
        fp2 = _state_fingerprint(
            {"b": {"w": np.arange(4, dtype=np.float32)},
             "a": np.ones((2, 3), np.float32)}, 3)
        assert fp1 == fp2  # order-stable
        assert fp1 != _state_fingerprint(params, 4)  # epoch-sensitive
        params["b"]["w"] = params["b"]["w"] + 1
        assert fp1 != _state_fingerprint(params, 3)  # value-sensitive


class TestSoftConstraintSPMD:
    """The soft-constraint half of the loss surface (past_flow decoders +
    OBGCC + const_vel + second-order smoothness, train.lua:435-441) must
    compile and execute under SPMD on the data x spatial mesh — the hard
    OBCC step is covered by __graft_entry__.dryrun_multichip."""

    def test_soft_train_step_on_data_spatial_mesh(self):
        import jax.numpy as jnp
        from jax.sharding import Mesh, NamedSharding

        from back2future_tpu.config import Options
        from back2future_tpu.losses import build_criterions
        from back2future_tpu.models.pwc import PWCNet, pwc_config_from_options
        from back2future_tpu.train.state import create_train_state
        from back2future_tpu.train.step import make_train_step

        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs the 8-device CPU mesh")
        mesh = Mesh(np.array(devs[:8]).reshape(4, 2), ("data", "spatial"))

        opt = Options(
            optimize="pme", pme_criterion="OBGCC", past_flow=True,
            const_vel=1.0, smooth_second_order=True, frames=3, levels=4,
            batchSize=4, compute_dtype="float32").derive()
        crits = build_criterions(opt)
        model = PWCNet(pwc_config_from_options(opt))

        B, H, W = 4, 32, 64
        rng = np.random.RandomState(0)
        images = rng.randn(B, H, W, 9).astype(np.float32) * 0.1
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, H, W, 9), jnp.float32))["params"]
        state = create_train_state(params, opt)
        state = state.replace(params=replicate(state.params, mesh),
                              opt_state=replicate(state.opt_state, mesh))
        batch = {"images": jax.device_put(
            images, NamedSharding(mesh, P("data", "spatial", None, None)))}

        step = make_train_step(model, opt, crits, donate=False)
        with mesh:
            new_state, logs = step(state, batch)
        assert np.isfinite(float(logs["loss"]))
        # the past-flow decoders received gradient (their params moved)
        moved = any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for k in params if k.startswith("past_decoder_")
            for a, b in zip(jax.tree_util.tree_leaves(params[k]),
                            jax.tree_util.tree_leaves(new_state.params[k])))
        assert moved

    def test_five_frame_train_step_on_mesh(self):
        """F=5 under SPMD: the frame-distance-dilated cost volumes
        (CostVolMulti.lua:68-69) and the 4 warp branches must partition
        on the data x spatial mesh like the flagship F=3 path."""
        import jax.numpy as jnp
        from jax.sharding import Mesh, NamedSharding

        from back2future_tpu.config import Options
        from back2future_tpu.losses import build_criterions
        from back2future_tpu.models.pwc import PWCNet, pwc_config_from_options
        from back2future_tpu.train.state import create_train_state
        from back2future_tpu.train.step import make_train_step

        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs the 8-device CPU mesh")
        mesh = Mesh(np.array(devs[:8]).reshape(4, 2), ("data", "spatial"))

        opt = Options(optimize="pme", frames=5, levels=4, batchSize=4,
                      compute_dtype="float32").derive()
        crits = build_criterions(opt)
        model = PWCNet(pwc_config_from_options(opt))

        B, H, W, C = 4, 32, 64, 15
        rng = np.random.RandomState(0)
        images = rng.randn(B, H, W, C).astype(np.float32) * 0.1
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, H, W, C), jnp.float32))["params"]
        state = create_train_state(params, opt)
        state = state.replace(params=replicate(state.params, mesh),
                              opt_state=replicate(state.opt_state, mesh))
        batch = {"images": jax.device_put(
            images, NamedSharding(mesh, P("data", "spatial", None, None)))}

        step = make_train_step(model, opt, crits, donate=False)
        with mesh:
            _, logs = step(state, batch)
        assert np.isfinite(float(logs["loss"]))

    def test_spynet_train_step_on_data_mesh(self):
        """The SPyNet variant (models/spynet.lua) must also run data-
        parallel — netType is a CLI knob, so both model families need
        mesh coverage."""
        import jax.numpy as jnp
        from jax.sharding import NamedSharding

        from back2future_tpu.config import Options
        from back2future_tpu.losses import build_criterions
        from back2future_tpu.models.spynet import (SPyNet,
                                                   spynet_config_from_options)
        from back2future_tpu.train.state import create_train_state
        from back2future_tpu.train.step import make_train_step

        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs the 8-device CPU mesh")
        mesh = make_mesh(devs[:8])

        opt = Options(netType="spynet", optimize="pme", frames=3, levels=3,
                      batchSize=8, compute_dtype="float32").derive()
        crits = build_criterions(opt)
        model = SPyNet(spynet_config_from_options(opt))

        B, H, W = 8, 32, 64
        rng = np.random.RandomState(0)
        images = rng.randn(B, H, W, 9).astype(np.float32) * 0.1
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, H, W, 9), jnp.float32))["params"]
        state = create_train_state(params, opt)
        state = state.replace(params=replicate(state.params, mesh),
                              opt_state=replicate(state.opt_state, mesh))
        batch = {"images": jax.device_put(
            images, NamedSharding(mesh, P("data", None, None, None)))}

        step = make_train_step(model, opt, crits, donate=False)
        with mesh:
            _, logs = step(state, batch)
        assert np.isfinite(float(logs["loss"]))
