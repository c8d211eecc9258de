"""-remat 1: rematerialized backward (jax.checkpoint on the forward).

TPU-native extension (no reference analog): instead of holding the whole
activation pyramid in HBM for the backward, recompute it — exact by
construction, and the memory saving is asserted quantitatively here via
XLA's compiled memory stats.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from back2future_tpu.config import Options
from back2future_tpu.losses import build_criterions
from back2future_tpu.models.pwc import PWCNet, pwc_config_from_options
from back2future_tpu.train.state import create_train_state
from back2future_tpu.train.step import make_train_step


def _setup(remat: int, B=2, H=32, W=64):
    opt = Options(optimize="pme", frames=3, levels=4, batchSize=B,
                  compute_dtype="float32", remat=remat).derive()
    crits = build_criterions(opt)
    model = PWCNet(pwc_config_from_options(opt))
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, H, W, 9).astype(np.float32) * 0.1)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, H, W, 9), jnp.float32))["params"]
    state = create_train_state(params, opt)
    step = make_train_step(model, opt, crits, donate=False)
    return opt, step, state, {"images": images}


class TestRemat:
    def test_grads_match_non_remat(self):
        """jax.checkpoint recomputes the same ops: the updated params must
        match the non-remat step to float tolerance."""
        _, step0, state0, batch = _setup(remat=0)
        _, step1, state1, batch1 = _setup(remat=1)

        new0, logs0 = step0(state0, batch)
        new1, logs1 = step1(state1, batch1)

        assert np.allclose(float(logs0["loss"]), float(logs1["loss"]),
                           rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(new0.params),
                        jax.tree_util.tree_leaves(new1.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)

    def test_remat_primitive_in_jaxpr(self):
        """Structural check (backend-independent): -remat 1 wraps the
        forward in jax.checkpoint, so the traced step contains the remat
        primitive; -remat 0 must not."""
        _, step0, state0, batch = _setup(remat=0)
        _, step1, state1, _ = _setup(remat=1)

        jaxpr0 = str(jax.make_jaxpr(step0)(state0, batch))
        jaxpr1 = str(jax.make_jaxpr(step1)(state1, batch))
        assert "remat" in jaxpr1
        assert "remat" not in jaxpr0

    def test_reduces_temp_memory(self):
        """The compiled step's temp (activation) allocation must shrink
        under remat — the whole point of the flag. Quantitative only on
        TPU: the CPU backend's memory_analysis reflects a different
        (unfused, host-layout) schedule where remat can report MORE temp
        bytes, so the number is meaningless there."""
        if jax.default_backend() != "tpu":
            pytest.skip("temp-bytes accounting is only meaningful on TPU; "
                        "see test_remat_primitive_in_jaxpr for the "
                        "backend-independent structural check")
        opt0, step0, state0, batch = _setup(remat=0, B=2, H=64, W=128)
        opt1, step1, state1, _ = _setup(remat=1, B=2, H=64, W=128)
        from back2future_tpu.train.optim import lr_for_epoch

        def temp_bytes(step, opt, state):
            jitted = step.step_for_lr(lr_for_epoch(state.epoch, opt.LR))
            stats = jitted.lower(state, batch).compile().memory_analysis()
            if stats is None:
                pytest.skip("backend reports no memory stats")
            return stats.temp_size_in_bytes

        t0 = temp_bytes(step0, opt0, state0)
        t1 = temp_bytes(step1, opt1, state1)
        assert t1 < t0, f"remat temp {t1} !< baseline temp {t0}"

    def test_cli_flag_threads_through(self, tmp_path):
        from back2future_tpu.config import parse_args
        opt = parse_args(["--remat", "1", "--dataset", "Kitti2015",
                          "--cache", str(tmp_path)])
        assert opt.remat == 1
