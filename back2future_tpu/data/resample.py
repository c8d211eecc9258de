"""Host-side raster resampling (pure NumPy).

Two modes matching the torch `image.scale` surface used by the reference
(donkey.lua, back2future.lua):
  'simple'   — nearest-neighbor (used for flow/occ maps where interpolating
               across motion boundaries would corrupt labels)
  'bilinear' — bilinear with align-corners mapping `src = dst*(in-1)/(out-1)`,
               the convention of the reference's native ScaleBHWD kernel
               (extras/spybhwd/ScaleBHWD.cu:6-20)
"""

from __future__ import annotations

import ctypes

import numpy as np

_native = None


def _native_lib():
    """C++ OpenMP resampler (runtime/src/resample.cc); None -> NumPy."""
    global _native
    if _native is None:
        from ..runtime import load_library

        lib = load_library("resample")
        if lib is not None:
            fp = ctypes.POINTER(ctypes.c_float)
            for fn in (lib.resize_bilinear_f32, lib.resize_nearest_f32):
                fn.restype = None
                fn.argtypes = [fp, fp] + [ctypes.c_int64] * 5
        _native = (lib,)
    return _native[0]


def _resize_native(img: np.ndarray, out_h: int, out_w: int, mode: str):
    lib = _native_lib()
    if lib is None or img.dtype != np.float32:
        return None
    src = np.ascontiguousarray(img)
    out = np.empty((out_h, out_w, img.shape[2]), np.float32)
    fn = lib.resize_bilinear_f32 if mode == "bilinear" else lib.resize_nearest_f32
    fp = ctypes.POINTER(ctypes.c_float)
    fn(src.ctypes.data_as(fp), out.ctypes.data_as(fp),
       src.shape[0], src.shape[1], src.shape[2], out_h, out_w)
    return out


def resize(img: np.ndarray, out_h: int, out_w: int, mode: str = "bilinear") -> np.ndarray:
    """Resize (H, W) or (H, W, C) array to (out_h, out_w)."""
    img = np.asarray(img)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    h, w = img.shape[:2]
    if (h, w) == (out_h, out_w):
        out = img.copy()
        return out[..., 0] if squeeze else out

    if mode in ("bilinear", "simple"):
        native = _resize_native(img, out_h, out_w, mode)
        if native is not None:
            return native[..., 0] if squeeze else native

    if mode == "simple":
        ys = np.minimum((np.arange(out_h) * (h / out_h)).astype(np.int64), h - 1)
        xs = np.minimum((np.arange(out_w) * (w / out_w)).astype(np.int64), w - 1)
        out = img[ys[:, None], xs[None, :]]
    elif mode == "bilinear":
        ys = np.arange(out_h) * ((h - 1) / max(out_h - 1, 1))
        xs = np.arange(out_w) * ((w - 1) / max(out_w - 1, 1))
        y0 = np.floor(ys).astype(np.int64)
        x0 = np.floor(xs).astype(np.int64)
        y1 = np.minimum(y0 + 1, h - 1)
        x1 = np.minimum(x0 + 1, w - 1)
        wy = (ys - y0)[:, None, None]
        wx = (xs - x0)[None, :, None]
        im = img.astype(np.float32)
        top = im[y0][:, x0] * (1 - wx) + im[y0][:, x1] * wx
        bot = im[y1][:, x0] * (1 - wx) + im[y1][:, x1] * wx
        out = top * (1 - wy) + bot * wy
        if np.issubdtype(img.dtype, np.floating):
            out = out.astype(img.dtype)
    else:
        raise ValueError(f"unknown resize mode {mode!r}")
    return out[..., 0] if squeeze else out
