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
            lib.rotate_nearest_window_f32.restype = None
            lib.rotate_nearest_window_f32.argtypes = (
                [fp, fp] + [ctypes.c_int64] * 3 + [ctypes.c_double]
                + [ctypes.c_int64] * 6)
            lib.resize_bilinear_window_f32.restype = None
            lib.resize_bilinear_window_f32.argtypes = (
                [fp, fp] + [ctypes.c_int64] * 15)
            lib.resize_nearest_window_f32.restype = None
            lib.resize_nearest_window_f32.argtypes = (
                [fp, fp] + [ctypes.c_int64] * 11)
            lib.photo_pipeline_f32.restype = None
            lib.photo_pipeline_f32.argtypes = [
                fp, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                fp, ctypes.c_int64, fp, fp, ctypes.c_int64]
        _native = (lib,)
    return _native[0]


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


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
        row0, row1 = im[y0], im[y1]  # gather each source-row set once
        top = row0[:, x0] * (1 - wx) + row0[:, x1] * wx
        bot = row1[:, x0] * (1 - wx) + row1[:, x1] * wx
        out = top * (1 - wy) + bot * wy
        if np.issubdtype(img.dtype, np.floating):
            out = out.astype(img.dtype)
    else:
        raise ValueError(f"unknown resize mode {mode!r}")
    return out[..., 0] if squeeze else out


# ------------------------------------------------------------------ windowed
# Window-evaluated transforms for the augmentation fast path
# (augment.augment_sample_cropped): each computes only the output
# rectangle [oy, oy+wh) x [ox, ox+ww) of the virtual full output plane.
# Native kernels when available; NumPy fallbacks replicate the exact
# arithmetic of the corresponding full-plane implementation (f64 rotation
# maps + round-half-even; the bilinear fallback keeps the f64 weights of
# the NumPy `resize` path, the native one the f32 weights of
# resize_bilinear_f32 — fast and slow paths therefore agree bit-for-bit
# whichever backend is active).

def rotate_nearest_window(src: np.ndarray, angle: float, oy: int, ox: int,
                          wh: int, ww: int, flip_h: bool = False,
                          flip_v: bool = False) -> np.ndarray:
    """Nearest rotation of (H,W,C) about the full-image center, evaluated
    at output rows [oy,oy+wh) x cols [ox,ox+ww); source flips folded in
    (flips precede rotation in the augmentation order); zero fill both
    for out-of-image output coords (integer-translate folding) and
    out-of-image nearest sources."""
    h, w, c = src.shape
    lib = _native_lib()
    if lib is not None and src.dtype == np.float32:
        src = np.ascontiguousarray(src)
        out = np.empty((wh, ww, c), np.float32)
        lib.rotate_nearest_window_f32(_fp(src), _fp(out), h, w, c,
                                      float(angle), int(flip_h), int(flip_v),
                                      oy, ox, wh, ww)
        return out
    yg = np.arange(oy, oy + wh, dtype=np.int64)[:, None]
    xg = np.arange(ox, ox + ww, dtype=np.int64)[None, :]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ca, sa = np.cos(angle), np.sin(angle)
    xs = ca * (xg - cx) + sa * (yg - cy) + cx
    ys = -sa * (xg - cx) + ca * (yg - cy) + cy
    xi = np.round(xs).astype(np.int64)
    yi = np.round(ys).astype(np.int64)
    ok = ((yg >= 0) & (yg < h) & (xg >= 0) & (xg < w)
          & (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
    xsrc = np.clip(w - 1 - xi if flip_h else xi, 0, w - 1)
    ysrc = np.clip(h - 1 - yi if flip_v else yi, 0, h - 1)
    out = src[ysrc, xsrc]
    out[~ok] = 0
    return out


def resize_bilinear_window(srcbuf: np.ndarray, ih: int, iw: int,
                           oh: int, ow: int, oy: int, ox: int,
                           wh: int, ww: int, by0: int = 0, bx0: int = 0,
                           flip_h: bool = False, flip_v: bool = False
                           ) -> np.ndarray:
    """Align-corners bilinear (ih,iw)->(oh,ow) on an output window.
    `srcbuf` holds rows [by0,by0+bh) x [bx0,bx0+bw) of the virtual
    source. Flips are only valid with a full source buffer."""
    bh, bw, c = srcbuf.shape
    lib = _native_lib()
    if lib is not None and srcbuf.dtype == np.float32:
        srcbuf = np.ascontiguousarray(srcbuf)
        out = np.empty((wh, ww, c), np.float32)
        lib.resize_bilinear_window_f32(_fp(srcbuf), _fp(out), bh, bw, by0,
                                       bx0, ih, iw, c, oh, ow, int(flip_h),
                                       int(flip_v), oy, ox, wh, ww)
        return out
    ys = np.arange(oy, oy + wh) * ((ih - 1) / max(oh - 1, 1))
    xs = np.arange(ox, ox + ww) * ((iw - 1) / max(ow - 1, 1))
    y0 = np.minimum(np.floor(ys).astype(np.int64), ih - 1)
    x0 = np.minimum(np.floor(xs).astype(np.int64), iw - 1)
    y1 = np.minimum(y0 + 1, ih - 1)
    x1 = np.minimum(x0 + 1, iw - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    if flip_v:
        y0, y1 = ih - 1 - y0, ih - 1 - y1
    if flip_h:
        x0, x1 = iw - 1 - x0, iw - 1 - x1
    yb0 = np.clip(y0 - by0, 0, bh - 1)
    yb1 = np.clip(y1 - by0, 0, bh - 1)
    xb0 = np.clip(x0 - bx0, 0, bw - 1)
    xb1 = np.clip(x1 - bx0, 0, bw - 1)
    im = srcbuf.astype(np.float32)
    top = im[yb0][:, xb0] * (1 - wx) + im[yb0][:, xb1] * wx
    bot = im[yb1][:, xb0] * (1 - wx) + im[yb1][:, xb1] * wx
    out = top * (1 - wy) + bot * wy
    if np.issubdtype(srcbuf.dtype, np.floating):
        out = out.astype(srcbuf.dtype)
    return out


def resize_nearest_window(src: np.ndarray, oh: int, ow: int, oy: int,
                          ox: int, wh: int, ww: int, flip_h: bool = False,
                          flip_v: bool = False) -> np.ndarray:
    """Nearest resize (src dims)->(oh,ow) evaluated on an output window,
    source flips folded in."""
    ih, iw, c = src.shape
    lib = _native_lib()
    if lib is not None and src.dtype == np.float32:
        src = np.ascontiguousarray(src)
        out = np.empty((wh, ww, c), np.float32)
        lib.resize_nearest_window_f32(_fp(src), _fp(out), ih, iw, c, oh, ow,
                                      int(flip_h), int(flip_v), oy, ox,
                                      wh, ww)
        return out
    ys = np.minimum((np.arange(oy, oy + wh) * (ih / oh)).astype(np.int64),
                    ih - 1)
    xs = np.minimum((np.arange(ox, ox + ww) * (iw / ow)).astype(np.int64),
                    iw - 1)
    if flip_v:
        ys = ih - 1 - ys
    if flip_h:
        xs = iw - 1 - xs
    return src[ys[:, None], xs[None, :]]
