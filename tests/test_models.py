"""Model graph tests: output structure, shapes, config variants, surgery."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from back2future_tpu.models import (
    PWCConfig, PWCNet, SPyNetConfig, SPyNet, convert_hard_to_soft,
)


def make_input(b=1, h=64, w=128, frames=3, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((b, h, w, 3 * frames)).astype(np.float32))


def init_and_run(model, x):
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    return params, jax.jit(model.apply)(params, x)


class TestPWCDefault:
    @pytest.fixture(scope="class")
    def out(self):
        cfg = PWCConfig(frames=3, levels=7, win=5, skip=2)
        model = PWCNet(cfg)
        x = make_input()
        params, levels = init_and_run(model, x)
        return cfg, params, levels

    def test_num_levels(self, out):
        cfg, _, levels = out
        assert len(levels) == cfg.num_output_levels == 5

    def test_shapes_finest_first(self, out):
        _, _, levels = out
        h, w = 64, 128
        for k, g in enumerate(levels):
            sh, sw = h >> k, w >> k
            assert g["flow"].shape == (1, sh, sw, 2)
            assert g["occ"].shape == (1, sh, sw, 2)
            assert len(g["warped"]) == 2
            for wimg in g["warped"]:
                assert wimg.shape == (1, sh, sw, 3)
            assert g["flow_past"] is None

    def test_flow_scales(self, out):
        _, _, levels = out
        assert [g["flow_scale"] for g in levels] == [20.0, 10.0, 5.0, 2.5, 1.25]

    def test_occ_is_softmax(self, out):
        _, _, levels = out
        s = np.asarray(levels[0]["occ"]).sum(-1)
        np.testing.assert_allclose(s, 1.0, atol=1e-5)

    def test_param_modules(self, out):
        _, params, _ = out
        names = set(params["params"].keys())
        assert {f"feat_{l}" for l in range(2, 8)} <= names
        assert {f"flow_decoder_{l}" for l in range(3, 8)} <= names
        assert {f"occ_decoder_{l}" for l in range(3, 8)} <= names
        assert not any(n.startswith("past_decoder") for n in names)


class TestPWCVariants:
    def test_past_flow(self):
        cfg = PWCConfig(frames=3, levels=5, win=3, skip=2, past_flow=True)
        model = PWCNet(cfg)
        x = make_input(h=32, w=32)
        _, levels = init_and_run(model, x)
        assert len(levels) == 3
        for g in levels:
            assert g["flow_past"] is not None
            assert g["flow_past"].shape == g["flow"].shape

    def test_two_frame_frames2(self):
        cfg = PWCConfig(frames=2, levels=5, win=3, skip=2)
        model = PWCNet(cfg)
        x = make_input(h=32, w=32, frames=2)
        _, levels = init_and_run(model, x)
        for g in levels:
            assert g["occ"] is None
            assert len(g["warped"]) == 1

    def test_two_frame_mode_frames3(self):
        cfg = PWCConfig(frames=3, levels=5, win=3, skip=2, two_frame=1)
        model = PWCNet(cfg)
        x = make_input(h=32, w=32)
        _, levels = init_and_run(model, x)
        for g in levels:
            assert g["occ"] is not None   # occ decoder still built when F>2
            assert len(g["warped"]) == 2  # both non-ref frames warped

    def test_skip0_full_res(self):
        cfg = PWCConfig(frames=3, levels=4, win=3, skip=0)
        model = PWCNet(cfg)
        x = make_input(h=16, w=16)
        _, levels = init_and_run(model, x)
        assert len(levels) == 4
        assert levels[0]["flow"].shape == (1, 16, 16, 2)

    def test_residual_and_sum_cvs(self):
        cfg = PWCConfig(frames=3, levels=5, win=3, skip=2, residual=1,
                        sum_cvs=True, occ_input=1)
        model = PWCNet(cfg)
        x = make_input(h=32, w=32)
        _, levels = init_and_run(model, x)
        assert len(levels) == 3

    def test_rescale_flow_scales(self):
        cfg = PWCConfig(frames=3, levels=5, win=3, skip=2, rescale_flow=1)
        assert cfg.flow_scales == (20.0, 20.0, 20.0)

    def test_siamese0(self):
        cfg = PWCConfig(frames=3, levels=4, win=3, skip=2, siamese=0)
        model = PWCNet(cfg)
        x = make_input(h=32, w=32)
        params, levels = init_and_run(model, x)
        assert not any(n.startswith("feat_") for n in params["params"])

    def test_jit_and_grad(self):
        cfg = PWCConfig(frames=3, levels=4, win=3, skip=2)
        model = PWCNet(cfg)
        x = make_input(h=16, w=16)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x)

        @jax.jit
        def loss(p, x):
            levels = model.apply(p, x)
            return sum(jnp.sum(g["flow"] ** 2) for g in levels)

        g = jax.grad(loss)(params, x)
        leaf_norms = [float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g)]
        assert all(np.isfinite(leaf_norms))
        assert sum(leaf_norms) > 0


class TestSurgery:
    def test_convert_hard_to_soft(self):
        x = make_input(h=32, w=32)
        hard_cfg = PWCConfig(frames=3, levels=5, win=3, skip=2, past_flow=False)
        soft_cfg = PWCConfig(frames=3, levels=5, win=3, skip=2, past_flow=True)
        hard = jax.jit(PWCNet(hard_cfg).init)(jax.random.PRNGKey(1), x)
        soft = jax.jit(PWCNet(soft_cfg).init)(jax.random.PRNGKey(2), x)

        new_params = convert_hard_to_soft(hard["params"], soft["params"])
        # shared modules copied verbatim
        for name in hard["params"]:
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
                hard["params"][name], new_params[name])
        # past decoders seeded from future decoders
        for l in range(3, 6):
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
                hard["params"][f"flow_decoder_{l}"], new_params[f"past_decoder_{l}"])

        # converted model runs
        out = jax.jit(PWCNet(soft_cfg).apply)({"params": new_params}, x)
        assert out[0]["flow_past"] is not None

    def test_soft_model_initially_mirrors_hard(self):
        """Right after conversion, past flow == future flow decoder output at
        the coarsest level (identical weights, identical cvs_flow input)."""
        x = make_input(h=32, w=32, seed=3)
        hard_cfg = PWCConfig(frames=3, levels=5, win=3, skip=2, past_flow=False)
        soft_cfg = PWCConfig(frames=3, levels=5, win=3, skip=2, past_flow=True)
        hard = jax.jit(PWCNet(hard_cfg).init)(jax.random.PRNGKey(1), x)
        soft = jax.jit(PWCNet(soft_cfg).init)(jax.random.PRNGKey(2), x)
        new_params = convert_hard_to_soft(hard["params"], soft["params"])
        out = jax.jit(PWCNet(soft_cfg).apply)({"params": new_params}, x)
        for g in out:
            np.testing.assert_allclose(np.asarray(g["flow_past"]),
                                       np.asarray(g["flow"]), atol=1e-5)


class TestSPyNet:
    def test_default_shapes(self):
        cfg = SPyNetConfig(frames=3, levels=4)
        model = SPyNet(cfg)
        x = make_input(h=32, w=64)
        _, levels = init_and_run(model, x)
        assert len(levels) == 4
        for k, g in enumerate(levels):
            assert g["flow"].shape == (1, 32 >> k, 64 >> k, 2)
            assert g["occ"].shape == (1, 32 >> k, 64 >> k, 2)
            assert len(g["warped"]) == 2
        assert [g["flow_scale"] for g in levels] == [20.0, 10.0, 5.0, 2.5]

    def test_frames2(self):
        cfg = SPyNetConfig(frames=2, levels=3)
        model = SPyNet(cfg)
        x = make_input(h=16, w=16, frames=2)
        _, levels = init_and_run(model, x)
        for g in levels:
            assert g["occ"] is None
            assert len(g["warped"]) == 1

    def test_residual_occ_input(self):
        cfg = SPyNetConfig(frames=3, levels=3, residual=1, occ_input=1)
        model = SPyNet(cfg)
        x = make_input(h=16, w=16)
        _, levels = init_and_run(model, x)
        assert len(levels) == 3

    def test_residual_next_level_gets_doubled_flow(self, monkeypatch):
        """With residual=1 the next level upsamples out_level[l-1][1] — the
        OUTPUT flow after the second residual add (models/spynet.lua:99,
        144-147) — not the singly-added flow the level warps with."""
        import back2future_tpu.models.spynet as spymod
        real_up = spymod.upsample_bilinear2x
        seen = []

        def recording_up(t):
            seen.append(np.asarray(t))
            return real_up(t)

        cfg = SPyNetConfig(frames=3, levels=3, residual=1)
        model = SPyNet(cfg)
        x = make_input(h=16, w=16)
        params = model.init(jax.random.PRNGKey(0), x)
        monkeypatch.setattr(spymod, "upsample_bilinear2x", recording_up)
        levels = model.apply(params, x)
        # finest-first output: levels[-1] is the coarsest (l=1)
        assert len(seen) == 2
        np.testing.assert_array_equal(seen[0], np.asarray(levels[-1]["flow"]))
        np.testing.assert_array_equal(seen[1], np.asarray(levels[-2]["flow"]))
