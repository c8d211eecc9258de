"""Native C++ runtime components vs their NumPy reference paths."""

import numpy as np
import pytest

from back2future_tpu.runtime import native_available


needs_toolchain = pytest.mark.skipif(
    not native_available("resample"), reason="no C++ toolchain")


def _numpy_resize(img, out_h, out_w, mode):
    """Force the pure-NumPy path by using float64 input."""
    from back2future_tpu.data.resample import resize

    out = resize(img.astype(np.float64), out_h, out_w, mode)
    return out.astype(np.float32)


@needs_toolchain
class TestNativeResample:
    @pytest.mark.parametrize("mode", ["bilinear", "simple"])
    @pytest.mark.parametrize("shape,out", [((37, 53, 3), (80, 110)),
                                           ((64, 48, 9), (20, 15)),
                                           ((5, 7, 1), (5, 14))])
    def test_matches_numpy(self, mode, shape, out):
        from back2future_tpu.data.resample import resize

        rng = np.random.default_rng(0)
        img = rng.random(shape).astype(np.float32)
        a = resize(img, out[0], out[1], mode)          # native (f32)
        b = _numpy_resize(img, out[0], out[1], mode)   # numpy (f64 path)
        assert a.dtype == np.float32
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    def test_2d_squeeze(self):
        from back2future_tpu.data.resample import resize

        img = np.random.default_rng(1).random((30, 40)).astype(np.float32)
        out = resize(img, 60, 80, "bilinear")
        assert out.shape == (60, 80)

    def test_identity_passthrough(self):
        from back2future_tpu.data.resample import resize

        img = np.random.default_rng(2).random((8, 8, 3)).astype(np.float32)
        np.testing.assert_array_equal(resize(img, 8, 8), img)


def test_png_defilter_native_or_fallback(tmp_path):
    """png16 uses the native defilter when available; roundtrip either way."""
    from back2future_tpu.io.png16 import read_png, write_png

    rng = np.random.default_rng(0)
    img = (rng.random((21, 33, 3)) * 65535).astype(np.uint16)
    write_png(tmp_path / "x.png", img)
    np.testing.assert_array_equal(read_png(tmp_path / "x.png"), img)
