"""Unit tests for ops: warp, cost volume, pyramid resampling.

Where an independent oracle exists (torch CPU), forward numerics are checked
against it; gradients are checked against finite differences and against
the reference's documented backward formulas.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from back2future_tpu.ops import (
    warp_bilinear, cost_volume, cost_volume_multi,
    avg_pool2, subsample2, upsample_nearest2x, upsample_bilinear2x,
    resize_bilinear, resize_nearest, spatial_softmax,
)

jax.config.update("jax_enable_x64", False)


def rng_array(shape, seed=0, scale=1.0):
    return (np.random.default_rng(seed).standard_normal(shape) * scale).astype(np.float32)


class TestWarpForward:
    def test_zero_flow_identity(self):
        img = rng_array((2, 9, 11, 3))
        flow = np.zeros((2, 9, 11, 2), np.float32)
        out = warp_bilinear(jnp.asarray(img), jnp.asarray(flow))
        np.testing.assert_allclose(np.asarray(out), img, atol=1e-6)

    def test_integer_shift(self):
        img = rng_array((1, 8, 8, 2), seed=1)
        flow = np.zeros((1, 8, 8, 2), np.float32)
        flow[..., 0] = 2.0  # sample from x+2
        out = np.asarray(warp_bilinear(jnp.asarray(img), jnp.asarray(flow)))
        np.testing.assert_allclose(out[0, :, :6], img[0, :, 2:], atol=1e-6)
        # beyond the border: clamped to last column
        np.testing.assert_allclose(out[0, :, 6], img[0, :, 7], atol=1e-6)
        np.testing.assert_allclose(out[0, :, 7], img[0, :, 7], atol=1e-6)

    def test_subpixel_lerp(self):
        img = np.zeros((1, 1, 4, 1), np.float32)
        img[0, 0, :, 0] = [0.0, 1.0, 2.0, 3.0]
        flow = np.full((1, 1, 4, 2), 0.0, np.float32)
        flow[..., 0] = 0.5
        out = np.asarray(warp_bilinear(jnp.asarray(img), jnp.asarray(flow)))
        np.testing.assert_allclose(out[0, 0, :, 0], [0.5, 1.5, 2.5, 3.0], atol=1e-6)

    def test_against_torch_grid_sample(self):
        """Forward equals grid_sample(align_corners=True, padding='border')
        on pixel-offset grids — the modified stnbhwd convention."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        b, h, w, c = 2, 13, 17, 4
        img = rng_array((b, h, w, c), seed=3)
        flow = rng_array((b, h, w, 2), seed=4, scale=3.0)

        out = np.asarray(warp_bilinear(jnp.asarray(img), jnp.asarray(flow)))

        timg = torch.from_numpy(img).permute(0, 3, 1, 2)
        gy, gx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        sx = flow[..., 0] + gx
        sy = flow[..., 1] + gy
        grid = np.stack([2 * sx / (w - 1) - 1, 2 * sy / (h - 1) - 1], axis=-1)
        ref = F.grid_sample(timg, torch.from_numpy(grid.astype(np.float32)),
                            mode="bilinear", padding_mode="border",
                            align_corners=True)
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(out, ref, atol=1e-5)


class TestWarpGrads:
    def test_image_grad_matches_autodiff(self):
        img = rng_array((1, 6, 7, 3), seed=5)
        flow = rng_array((1, 6, 7, 2), seed=6, scale=1.5)
        g = rng_array((1, 6, 7, 3), seed=7)

        def loss_ref(im):
            return jnp.sum(warp_bilinear(im, jnp.asarray(flow), reference_grads=True) * g)

        def loss_auto(im):
            return jnp.sum(warp_bilinear(im, jnp.asarray(flow), reference_grads=False) * g)

        d_ref = jax.grad(loss_ref)(jnp.asarray(img))
        d_auto = jax.grad(loss_auto)(jnp.asarray(img))
        np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d_auto), atol=1e-5)

    def test_flow_grad_interior_matches_fd(self):
        # strictly interior, non-integer coordinates -> true gradient
        img = rng_array((1, 8, 8, 2), seed=8)
        flow = np.full((1, 8, 8, 2), 0.3, np.float32)
        g = rng_array((1, 8, 8, 2), seed=9)

        def loss(fl):
            return jnp.sum(warp_bilinear(jnp.asarray(img), fl) * g)

        d = np.asarray(jax.grad(loss)(jnp.asarray(flow)))
        eps = 1e-3
        for (y, x, ch) in [(3, 3, 0), (4, 2, 1), (2, 5, 0)]:
            fp = flow.copy(); fp[0, y, x, ch] += eps
            fm = flow.copy(); fm[0, y, x, ch] -= eps
            fd = (loss(jnp.asarray(fp)) - loss(jnp.asarray(fm))) / (2 * eps)
            assert d[0, y, x, ch] == pytest.approx(float(fd), rel=1e-2, abs=1e-3)

    def test_image_grad_matmul_matches_scatter(self, monkeypatch):
        """The two-hot MXU transpose (_d_images_matmul) must agree with the
        quad scatter-add transpose exactly, including flows that clamp far
        outside the image."""
        from back2future_tpu.ops import warp as warp_mod

        img = rng_array((2, 9, 13, 5), seed=30)
        flow = rng_array((2, 9, 13, 2), seed=31, scale=25.0)  # mostly OOB
        g = rng_array((2, 9, 13, 5), seed=32)

        def d_img(fl):
            return jax.grad(lambda im: jnp.sum(
                warp_bilinear(im, jnp.asarray(fl)) * g))(jnp.asarray(img))

        d_scatter = np.asarray(d_img(flow))
        monkeypatch.setattr(warp_mod, "_MATMUL_DIMG_MAX_MACS", 1 << 60)
        monkeypatch.setattr(warp_mod, "_MATMUL_DIMG_MAX_T_ELEMS", 1 << 60)
        d_matmul = np.asarray(d_img(flow))
        np.testing.assert_allclose(d_matmul, d_scatter, atol=1e-4)

    def test_flow_grad_alive_at_clamped_border(self):
        """Reference backward keeps a finite-difference gradient where the
        coordinate clamps at the border; autodiff-of-clip kills it."""
        img = rng_array((1, 6, 6, 1), seed=10)
        flow = np.zeros((1, 6, 6, 2), np.float32)
        flow[..., 0] = -3.0  # clamps at the left border for x < 3

        def loss(fl, ref):
            return jnp.sum(warp_bilinear(jnp.asarray(img), fl, reference_grads=ref))

        d_ref = np.asarray(jax.grad(lambda f: loss(f, True))(jnp.asarray(flow)))
        d_auto = np.asarray(jax.grad(lambda f: loss(f, False))(jnp.asarray(flow)))
        # at x=0, coordinate clamps to 0: reference gives I[1]-I[0] (forward diff)
        expect = img[0, :, 1, 0] - img[0, :, 0, 0]
        np.testing.assert_allclose(d_ref[0, :, 0, 0], expect, atol=1e-5)
        np.testing.assert_allclose(d_auto[0, :, 0, 0], 0.0, atol=1e-6)


def numpy_cost_volume_multi(ref, frames, win, fwd):
    """Brute-force oracle mirroring CostVolMulti.lua:49-108."""
    b, h, w, c = ref.shape
    n = (win - 1) // 2
    out = np.zeros((b, h, w, win * win), np.float32)
    for k, frame in enumerate(frames):
        dil = k + 1
        i = 0
        for qx_ in range(-n, n + 1):
            for qy_ in range(-n, n + 1):
                qx, qy = qx_ * dil, qy_ * dil
                if not fwd:
                    qx, qy = -qx, -qy
                for y in range(h):
                    for x in range(w):
                        ys, xs = y - qy, x - qx
                        if 0 <= ys < h and 0 <= xs < w:
                            out[:, y, x, i] += np.sum(
                                ref[:, y, x] * frame[:, ys, xs], axis=-1)
                i += 1
    return out / (c * len(frames))


class TestCostVolume:
    @pytest.mark.parametrize("fwd", [True, False])
    @pytest.mark.parametrize("unroll", [True, False])
    def test_matches_bruteforce(self, fwd, unroll):
        b, h, w, c = 1, 6, 7, 3
        ref = rng_array((b, h, w, c), seed=20)
        f1 = rng_array((b, h, w, c), seed=21)
        f2 = rng_array((b, h, w, c), seed=22)
        out = np.asarray(cost_volume_multi(
            jnp.asarray(ref), [jnp.asarray(f1), jnp.asarray(f2)], 3,
            fwd=fwd, unroll=unroll))
        expect = numpy_cost_volume_multi(ref, [f1, f2], 3, fwd)
        np.testing.assert_allclose(out, expect, atol=1e-5)

    def test_impulse_peak(self):
        """The commented-out reference self-test (CostVolMulti.lua:225-253):
        an impulse moving diagonally produces a peak at the matching
        dilated displacement for both fwd and bwd volumes."""
        win, h, w = 5, 9, 9
        def impulse(y, x):
            im = np.zeros((1, h, w, 1), np.float32)
            im[0, y, x, 0] = 1.0
            return im
        ref = impulse(4, 4)
        futures = [impulse(5, 5), impulse(6, 6)]   # +1/frame diagonal motion
        pasts = [impulse(3, 3), impulse(2, 2)]

        fwd = np.asarray(cost_volume_multi(
            jnp.asarray(ref), [jnp.asarray(f) for f in futures], win, fwd=True))
        bwd = np.asarray(cost_volume_multi(
            jnp.asarray(ref), [jnp.asarray(p) for p in pasts], win, fwd=False))

        n = (win - 1) // 2
        # displacement (qx,qy)=(1,1): channel (1+n)*win + (1+n)
        i = (1 + n) * win + (1 + n)
        # frame at q=(1,1) matches ref pixel at (4,4) -> frame(3,3)? No:
        # cost(p, q) = ref(p) * frame(p - q); impulse ref at (4,4), future1 at
        # (5,5): nonzero when p=(4,4), p-q=(5,5) -> q=(-1,-1)
        j = (n - 1) * win + (n - 1)
        assert fwd[0, 4, 4, j] > 0
        assert bwd[0, 4, 4, j] > 0  # past mirrored: -q * -1 lands same channel
        # and nothing matches at the opposite displacement
        assert fwd[0, 4, 4, i] == 0

    def test_linearity_gradients(self):
        ref = rng_array((1, 5, 5, 2), seed=30)
        f1 = rng_array((1, 5, 5, 2), seed=31)
        g = rng_array((1, 5, 5, 9), seed=32)

        def loss(r, f):
            return jnp.sum(cost_volume_multi(r, [f], 3) * g)

        dr, df = jax.grad(loss, argnums=(0, 1))(jnp.asarray(ref), jnp.asarray(f1))
        eps = 1e-2
        for (y, x, ch) in [(2, 2, 0), (1, 3, 1)]:
            rp = ref.copy(); rp[0, y, x, ch] += eps
            rm = ref.copy(); rm[0, y, x, ch] -= eps
            fd = (loss(jnp.asarray(rp), jnp.asarray(f1))
                  - loss(jnp.asarray(rm), jnp.asarray(f1))) / (2 * eps)
            assert np.asarray(dr)[0, y, x, ch] == pytest.approx(float(fd), rel=1e-3, abs=1e-4)


class TestPyramid:
    def test_avg_pool2_vs_torch(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F
        x = rng_array((2, 8, 10, 3), seed=40)
        out = np.asarray(avg_pool2(jnp.asarray(x)))
        ref = F.avg_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), 2, 2)
        np.testing.assert_allclose(out, ref.permute(0, 2, 3, 1).numpy(), atol=1e-6)

    def test_subsample2(self):
        x = rng_array((1, 6, 6, 2), seed=41)
        np.testing.assert_array_equal(np.asarray(subsample2(jnp.asarray(x))), x[:, ::2, ::2])

    def test_upsample_nearest2x(self):
        x = rng_array((1, 3, 4, 2), seed=42)
        out = np.asarray(upsample_nearest2x(jnp.asarray(x)))
        assert out.shape == (1, 6, 8, 2)
        np.testing.assert_array_equal(out[0, ::2, ::2], x[0])
        np.testing.assert_array_equal(out[0, 1::2, 1::2], x[0])

    def test_upsample_bilinear2x_vs_torch_align_corners(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F
        x = rng_array((2, 5, 7, 3), seed=43)
        out = np.asarray(upsample_bilinear2x(jnp.asarray(x)))
        ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                            scale_factor=2, mode="bilinear", align_corners=True)
        np.testing.assert_allclose(out, ref.permute(0, 2, 3, 1).numpy(), atol=1e-5)

    def test_resize_bilinear_arbitrary_vs_torch(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F
        x = rng_array((1, 9, 13, 2), seed=44)
        out = np.asarray(resize_bilinear(jnp.asarray(x), 5, 20))
        ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                            size=(5, 20), mode="bilinear", align_corners=True)
        np.testing.assert_allclose(out, ref.permute(0, 2, 3, 1).numpy(), atol=1e-5)

    def test_resize_nearest(self):
        x = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1))
        out = np.asarray(resize_nearest(x, 2, 2))
        np.testing.assert_array_equal(out[0, :, :, 0], [[0, 2], [8, 10]])

    def test_spatial_softmax(self):
        x = rng_array((1, 3, 3, 2), seed=45)
        out = np.asarray(spatial_softmax(jnp.asarray(x)))
        np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-6)
