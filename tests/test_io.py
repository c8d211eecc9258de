"""Unit tests for the io layer (flow formats, PNG codec, viz, occlusions)."""

import numpy as np
import pytest

from back2future_tpu.io import (
    load_flow, load_flo, write_flo, load_pfm, write_pfm,
    load_kitti_png, write_kitti_png, load_disp, write_disp,
    compute_norm, compute_angle, xy2rgb, get_occ, rotate_flow,
)
from back2future_tpu.io.png16 import read_png, write_png
from back2future_tpu.data.resample import resize


def random_flow(h=17, w=23, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(0, 5, size=(h, w, 2)).astype(np.float32)


class TestFlo:
    def test_roundtrip(self, tmp_path):
        flow = random_flow()
        p = tmp_path / "a.flo"
        write_flo(p, flow)
        out = load_flo(p)
        np.testing.assert_array_equal(out, flow)

    def test_dispatch(self, tmp_path):
        flow = random_flow()
        p = tmp_path / "a.flo"
        write_flo(p, flow)
        out, valid = load_flow(p)
        np.testing.assert_array_equal(out, flow)
        assert valid is None

    def test_magic_check(self, tmp_path):
        p = tmp_path / "bad.flo"
        p.write_bytes(b"\x00" * 64)
        with pytest.raises(ValueError):
            load_flo(p)


class TestDisp:
    def test_roundtrip(self, tmp_path):
        occ = np.random.default_rng(1).choice([0.0, 0.5, 1.0], size=(11, 13)).astype(np.float32)
        p = tmp_path / "a.disp"
        write_disp(p, occ)
        np.testing.assert_array_equal(load_disp(p), occ)


class TestPfm:
    def test_roundtrip_le(self, tmp_path):
        flow = random_flow(9, 12)
        p = tmp_path / "a.pfm"
        write_pfm(p, flow, scale=-1.0)
        out = load_pfm(p)
        np.testing.assert_allclose(out, flow, rtol=0, atol=0)

    def test_roundtrip_be(self, tmp_path):
        flow = random_flow(5, 6, seed=3)
        p = tmp_path / "b.pfm"
        write_pfm(p, flow, scale=1.0)
        np.testing.assert_allclose(load_pfm(p), flow)


class TestPng16:
    @pytest.mark.parametrize("dtype,channels", [
        (np.uint8, 1), (np.uint8, 3), (np.uint16, 1), (np.uint16, 3),
    ])
    def test_roundtrip(self, tmp_path, dtype, channels):
        rng = np.random.default_rng(7)
        hi = 255 if dtype == np.uint8 else 65535
        img = rng.integers(0, hi + 1, size=(21, 34, channels)).astype(dtype)
        p = tmp_path / "x.png"
        write_png(p, img)
        out = read_png(p)
        np.testing.assert_array_equal(out, img)

    def test_pil_interop_8bit(self, tmp_path):
        """Our decoder agrees with PIL on PIL-written 8-bit RGB files."""
        from PIL import Image
        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, size=(16, 20, 3)).astype(np.uint8)
        p = tmp_path / "pil.png"
        Image.fromarray(img).save(p)
        np.testing.assert_array_equal(read_png(p), img)

    def test_pil_reads_ours(self, tmp_path):
        from PIL import Image
        rng = np.random.default_rng(12)
        img = rng.integers(0, 256, size=(8, 9, 3)).astype(np.uint8)
        p = tmp_path / "ours.png"
        write_png(p, img)
        np.testing.assert_array_equal(np.asarray(Image.open(p)), img)


class TestKittiPng:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(5)
        # representable flow values: multiples of 1/64
        flow = (rng.integers(-2000, 2000, size=(14, 19, 2)) / 64.0).astype(np.float32)
        valid = (rng.random((14, 19)) > 0.3).astype(np.float32)
        p = tmp_path / "k.png"
        write_kitti_png(p, flow, valid)
        out_flow, out_valid = load_kitti_png(p)
        np.testing.assert_allclose(out_flow, flow, atol=1e-6)
        np.testing.assert_array_equal(out_valid, valid)


class TestViz:
    def test_angle_quadrants(self):
        u = np.array([1.0, 0.0, -1.0, 0.0, 1.0, -1.0, -1.0, 1.0])
        v = np.array([0.0, 1.0, 0.0, -1.0, 1.0, 1.0, -1.0, -1.0])
        ang = compute_angle(u, v)
        np.testing.assert_allclose(ang, [0, 90, 180, 270, 45, 135, 225, 315])

    def test_norm(self):
        assert compute_norm(np.array([3.0]), np.array([4.0]))[0] == pytest.approx(5.0)

    def test_xy2rgb_shape_and_range(self):
        rgb, mx = xy2rgb(random_flow(8, 10))
        assert rgb.shape == (8, 10, 3)
        assert rgb.min() >= 0.0 and rgb.max() <= 1.0
        assert mx > 0

    def test_zero_flow_is_white(self):
        rgb, _ = xy2rgb(np.zeros((4, 4, 2)))
        np.testing.assert_allclose(rgb, 1.0, atol=1e-6)


class TestGetOcc:
    def test_static_scene_visible(self):
        occ = get_occ(np.ones((6, 6)), np.zeros((6, 6, 2)))
        np.testing.assert_array_equal(occ, 0.5)

    def test_out_of_image_marks_occluded(self):
        # uniform rightward flow pushes the right edge out of image -> fwd occ,
        # and nothing maps into the left edge -> those source pixels also see
        # out-of-image in the backward pass -> bwd occ.
        flow = np.zeros((5, 8, 2))
        flow[..., 0] = 3.0
        occ = get_occ(np.ones((5, 8)), flow)
        assert (occ[:, -1] == 1.0).all()   # rightmost column forward-occluded
        assert (occ[:, 0] == 0.0).all()    # leftmost column backward-occluded

    def test_half_tie_rounding_matches_torch(self):
        """torch.round is half-away-from-zero in getOCC's 1-BASED frame
        (flowExtensions.lua:184-185); np.round's half-even (or half-away
        in a 0-based frame) diverges on exact .5 ties, which KITTI's
        1/64-quantized flow does produce. Hand-derived fixture: constant
        u=1.5 on flat depth maps every x to x+2 (round(x_1+1.5) = x_1+2
        away from zero), so the two rightmost columns forward-occlude and
        only column 0 backward-occludes (round(1-1.5) = round(-0.5) = -1,
        out of image; x>=1 lands in-bounds at x-1)."""
        flow = np.zeros((5, 6, 2))
        flow[..., 0] = 1.5
        occ = get_occ(np.ones((5, 6)), flow)
        expect = np.tile([0.0, 0.5, 0.5, 0.5, 1.0, 1.0], (5, 1))
        np.testing.assert_array_equal(occ, expect)

    def test_native_matches_reference_oracle(self):
        """Native fast path (runtime/src/getocc.cc) must reproduce the
        pure-Python loop bit-exactly, including z-buffer collision order
        and the lower-median filter (flowExtensions.lua:172-239)."""
        from back2future_tpu.io.occ import _native_get_occ, get_occ_reference
        from back2future_tpu.runtime import native_available

        if not native_available("getocc"):
            pytest.skip("no native toolchain")
        rng = np.random.default_rng(11)
        for trial in range(5):
            h, w = rng.integers(6, 20, size=2)
            depth = rng.random((h, w)) * 10
            flow = rng.normal(0, 3, size=(h, w, 2))
            if trial == 2:
                flow = np.round(flow)          # exercise exact-integer hits
            if trial == 3:
                depth = np.ones((h, w))        # ties: collision else-branch
            if trial == 4:
                flow = np.round(flow * 2) / 2  # exact .5 rounding ties
            ref = get_occ_reference(depth, flow)
            nat = _native_get_occ(depth, flow)
            np.testing.assert_array_equal(nat, ref)

    def test_native_is_fast_at_kitti_resolution(self):
        from back2future_tpu.io.occ import _native_get_occ
        from back2future_tpu.runtime import native_available

        if not native_available("getocc"):
            pytest.skip("no native toolchain")
        import time

        rng = np.random.default_rng(0)
        depth = rng.random((375, 1242)) * 50
        flow = rng.normal(0, 10, size=(375, 1242, 2))
        t0 = time.perf_counter()
        occ = _native_get_occ(depth, flow)
        dt = time.perf_counter() - t0
        assert occ.shape == (375, 1242)
        assert set(np.unique(occ)) <= {0.0, 0.5, 1.0}
        assert dt < 1.0, f"native get_occ too slow: {dt:.3f}s"


class TestRotateFlow:
    def test_identity(self):
        flow = random_flow(10, 10)
        np.testing.assert_allclose(rotate_flow(flow, 0.0), flow, atol=1e-6)

    def test_quarter_turn_vectors(self):
        # 90° rotation maps +x displacement into the rotated frame
        flow = np.zeros((7, 7, 2), np.float32)
        flow[..., 0] = 1.0
        out = rotate_flow(flow, np.pi / 2)
        center = out[3, 3]
        np.testing.assert_allclose(center, [0.0, -1.0], atol=1e-6)


class TestResize:
    def test_identity(self):
        img = random_flow(6, 8)
        np.testing.assert_array_equal(resize(img, 6, 8), img)

    def test_simple_downscale(self):
        img = np.arange(16, dtype=np.float32).reshape(4, 4)
        out = resize(img, 2, 2, mode="simple")
        np.testing.assert_array_equal(out, [[0, 2], [8, 10]])

    def test_bilinear_upscale_corners_align(self):
        img = np.array([[0.0, 1.0], [2.0, 3.0]], np.float32)
        out = resize(img, 3, 3, mode="bilinear")
        assert out[0, 0] == 0.0 and out[2, 2] == 3.0
        assert out[1, 1] == pytest.approx(1.5)
