"""Pallas cost-volume kernel vs the pure-XLA reference implementation.

On the CPU test platform the kernel runs in interpreter mode; the same
code compiles via Mosaic on TPU. Forward and both VJPs must match the
XLA path bit-for-bit in f32 (identical math, f32 accumulation).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from back2future_tpu.ops import cost_volume, cost_volume_multi
from back2future_tpu.ops.cost_volume_pallas import cost_volume_pallas, fits_vmem


def arrs(b=2, h=12, w=16, c=8, seed=0):
    rng = np.random.default_rng(seed)
    ref = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    frame = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    return ref, frame


class TestForward:
    @pytest.mark.parametrize("fwd", [True, False])
    @pytest.mark.parametrize("dilation", [1, 2])
    def test_matches_xla(self, fwd, dilation):
        ref, frame = arrs()
        want = cost_volume(ref, frame, win=5, dilation=dilation, fwd=fwd)
        got = cost_volume_pallas(ref, frame, 5, dilation, fwd)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_win9(self):
        ref, frame = arrs(b=1, h=10, w=12, c=4)
        want = cost_volume(ref, frame, win=9)
        got = cost_volume_pallas(ref, frame, 9, 1, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_bf16_inputs(self):
        ref, frame = arrs(c=4)
        got = cost_volume_pallas(ref.astype(jnp.bfloat16),
                                 frame.astype(jnp.bfloat16), 3, 1, True)
        want = cost_volume(ref.astype(jnp.bfloat16).astype(jnp.float32),
                           frame.astype(jnp.bfloat16).astype(jnp.float32),
                           win=3)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want), rtol=2e-2, atol=2e-2)


class TestBackward:
    @pytest.mark.parametrize("fwd", [True, False])
    def test_grads_match_xla(self, fwd):
        ref, frame = arrs(b=1, h=8, w=10, c=4)

        def loss_pallas(r, f):
            cv = cost_volume_pallas(r, f, 5, 1, fwd)
            return jnp.sum(cv * jnp.cos(cv))

        def loss_xla(r, f):
            cv = cost_volume(r, f, win=5, dilation=1, fwd=fwd)
            return jnp.sum(cv * jnp.cos(cv))

        gp = jax.grad(loss_pallas, argnums=(0, 1))(ref, frame)
        gx = jax.grad(loss_xla, argnums=(0, 1))(ref, frame)
        for a, b in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

    def test_grads_dilated(self):
        ref, frame = arrs(b=1, h=10, w=10, c=4, seed=3)

        def f(impl):
            def loss(r, fr):
                return jnp.sum(impl(r, fr) ** 2)
            return jax.grad(loss, argnums=(0, 1))(ref, frame)

        gp = f(lambda r, fr: cost_volume_pallas(r, fr, 3, 2, False))
        gx = f(lambda r, fr: cost_volume(r, fr, win=3, dilation=2, fwd=False))
        for a, b in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)


class TestDispatch:
    def test_multi_use_pallas_matches(self):
        ref, f1 = arrs(b=1, h=8, w=8, c=4, seed=1)
        _, f2 = arrs(b=1, h=8, w=8, c=4, seed=2)
        want = cost_volume_multi(ref, [f1, f2], win=3, fwd=True)
        got = cost_volume_multi(ref, [f1, f2], win=3, fwd=True,
                                use_pallas=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_vmem_gate(self):
        assert fits_vmem(80, 304, 64, 9, 1)          # KITTI level 3
        assert not fits_vmem(1024, 4096, 256, 9, 1)  # absurd: falls back

    def test_fallback_when_too_big(self):
        # monkey-level check: use_pallas with a shape failing the gate
        # still computes (via the XLA path)
        ref, frame = arrs(b=1, h=8, w=8, c=4)
        import back2future_tpu.ops.cost_volume_pallas as cvp
        orig = cvp._VMEM_BUDGET
        try:
            cvp._VMEM_BUDGET = 1
            out = cost_volume(ref, frame, win=3, use_pallas=True)
        finally:
            cvp._VMEM_BUDGET = orig
        want = cost_volume(ref, frame, win=3)
        # f32 associativity: the fallback may take the unrolled path
        # (e.g. under B2F_CV_MIN_HW), whose sum order differs from scan
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


class TestSPMDComposition:
    """pallas_call must compose with pjit auto-sharding over the test
    mesh (the dryrun's data x spatial layout): GSPMD has no partitioning
    rule for the kernel's custom-call, so this guards the resharding it
    inserts around it staying correct, forward AND backward."""

    def _mesh(self):
        from jax.sharding import Mesh
        devs = jax.devices()
        if len(devs) < 8:
            pytest.skip("needs the 8-device CPU mesh")
        return Mesh(np.array(devs[:8]).reshape(4, 2), ("data", "spatial"))

    def test_sharded_forward_and_grads_match_xla(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self._mesh()
        ref, frame = arrs(b=8, h=16, w=128, c=8)
        s = NamedSharding(mesh, P("data", "spatial", None, None))
        ref_s = jax.device_put(ref, s)
        frame_s = jax.device_put(frame, s)

        def loss_pallas(r, f):
            w = jnp.cos(jnp.arange(r.shape[1] * r.shape[2], dtype=r.dtype)
                        ).reshape(1, r.shape[1], r.shape[2], 1)
            return (cost_volume_pallas(r, f, 3, 1, True) * w).sum()

        def loss_xla(r, f):
            w = jnp.cos(jnp.arange(r.shape[1] * r.shape[2], dtype=r.dtype)
                        ).reshape(1, r.shape[1], r.shape[2], 1)
            return (cost_volume(r, f, 3, dilation=1, fwd=True) * w).sum()

        with mesh:
            out = jax.jit(
                lambda r, f: cost_volume_pallas(r, f, 3, 1, True)
            )(ref_s, frame_s)
            gr, gf = jax.jit(jax.grad(loss_pallas, (0, 1)))(ref_s, frame_s)
        want = cost_volume(ref, frame, 3, dilation=1, fwd=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
        wr, wf = jax.grad(loss_xla, (0, 1))(ref, frame)
        np.testing.assert_allclose(np.asarray(gr), np.asarray(wr),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(wf),
                                   rtol=1e-4, atol=1e-4)


class TestWarpDImagesKernel:
    """Fused two-hot transpose (warp_pallas.d_images_pallas) vs the
    scatter-based transpose, in interpret mode."""

    def _d_images(self, img, flow, g, force_pallas, monkeypatch):
        from back2future_tpu.ops import warp as warp_mod

        if force_pallas:
            monkeypatch.setenv("B2F_DIMG_PALLAS", "1")
        else:
            monkeypatch.setattr(warp_mod, "_pallas_dimg_enabled", lambda: False)
        return np.asarray(jax.grad(lambda im: jnp.sum(
            warp_mod.warp_bilinear(im, flow) * g))(img))

    @pytest.mark.parametrize("shape", [(2, 8, 16, 4), (1, 12, 8, 3)])
    def test_matches_scatter(self, shape, monkeypatch):
        rng = np.random.default_rng(3)
        b, h, w, c = shape
        img = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        flow = jnp.asarray((rng.standard_normal((b, h, w, 2)) * 6).astype(np.float32))
        g = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        want = self._d_images(img, flow, g, False, monkeypatch)
        got = self._d_images(img, flow, g, True, monkeypatch)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_far_out_of_bounds_flow(self, monkeypatch):
        rng = np.random.default_rng(4)
        shape = (1, 8, 8, 2)
        img = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        flow = jnp.asarray((rng.standard_normal((1, 8, 8, 2)) * 40).astype(np.float32))
        g = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        want = self._d_images(img, flow, g, False, monkeypatch)
        got = self._d_images(img, flow, g, True, monkeypatch)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


class TestStemPallas:
    """Fused levels-2+3 stem kernel (ops/stem_pallas.py) vs the XLA conv
    chain, in interpret mode. The kernel is measured-slower end-to-end
    (BENCHMARKS.md stem ledger) and defaults off; it stays correct and
    opt-in via B2F_STEM_PALLAS=1."""

    def _params(self, seed=0):
        rng = np.random.default_rng(seed)

        def conv(ci, co):
            return {"conv": {
                "kernel": jnp.asarray(
                    rng.normal(size=(3, 3, ci, co)).astype(np.float32) * 0.2),
                "bias": jnp.asarray(
                    rng.normal(size=(co,)).astype(np.float32) * 0.1)}}

        return ({"c0": conv(3, 16), "c1": conv(16, 16)},
                {"c0": conv(16, 32), "c1": conv(32, 32)})

    @pytest.mark.parametrize("shape", [(2, 16, 64), (1, 32, 128)])
    def test_forward_matches_xla(self, shape, monkeypatch):
        from back2future_tpu.ops.stem_pallas import (
            fused_stem, _stem_xla, stem_eligible)

        monkeypatch.setenv("B2F_STEM_PALLAS", "1")
        b, h, w = shape
        assert stem_eligible(h, w, 3, 16, 32)
        p2, p3 = self._params()
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((b, h, w, 3)).astype(np.float32))
        f2p, f3p = fused_stem(x, p2, p3, jnp.float32)
        f2x, f3x = _stem_xla(x, p2, p3, jnp.float32)
        np.testing.assert_allclose(np.asarray(f2p), np.asarray(f2x),
                                   rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(f3p), np.asarray(f3x),
                                   rtol=1e-5, atol=1e-4)

    def test_grads_match_xla(self, monkeypatch):
        from back2future_tpu.ops.stem_pallas import fused_stem, _stem_xla

        monkeypatch.setenv("B2F_STEM_PALLAS", "1")
        p2, p3 = self._params()
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((1, 16, 64, 3)).astype(np.float32))

        def loss(fn):
            def f(x, p2, p3):
                f2, f3 = fn(x, p2, p3, jnp.float32)
                return jnp.sum(f2 ** 2) + jnp.sum(f3 ** 2)
            return jax.grad(f, argnums=(0, 1, 2))(x, p2, p3)

        got = loss(fused_stem)
        want = loss(_stem_xla)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-3),
            got, want)

    def test_model_integration_matches(self, monkeypatch):
        """PWCNet output with the fused stem == plain XLA path."""
        from back2future_tpu.models import PWCConfig, PWCNet

        cfg = PWCConfig(frames=3, levels=5, win=3, skip=2)
        model = PWCNet(cfg)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((1, 16, 64, 9)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), x)

        monkeypatch.setenv("B2F_STEM_PALLAS", "0")
        want = model.apply(params, x)
        monkeypatch.setenv("B2F_STEM_PALLAS", "1")
        got = model.apply(params, x)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g["flow"]),
                                       np.asarray(w["flow"]),
                                       rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(np.asarray(g["occ"]),
                                       np.asarray(w["occ"]),
                                       rtol=1e-4, atol=1e-4)
