"""Host-side augmentation (pure NumPy, HWC with 3F stacked channels).

Photometric pipeline semantics follow the reference's fb.resnet-style
transforms generalized to 3F-channel stacks (transforms.lua:195-328):
per-3-channel-group grayscale/brightness/contrast/saturation applied in a
random order, AlexNet PCA lighting, ImageNet color normalization
(mean/std and PCA constants: donkey.lua:35-46).

Geometric pipeline semantics follow trainHook (donkey.lua:269-354):
coupled flips with flow-sign fixes, per-frame rotations r1 ± f*r2 with a
rotation-induced flow field, per-frame translations ±f*t, random scale in
[1,2) with flow-magnitude scaling, random crop.

All randomness flows through an explicit `np.random.Generator` so samples
are reproducible per worker seed (data.lua:32-37 seeds each donkey with
manualSeed+idx).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

# ImageNet statistics (donkey.lua:35-38)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
# AlexNet PCA lighting constants (donkey.lua:39-46)
PCA_EIGVAL = np.array([0.2175, 0.0188, 0.0045], np.float32)
PCA_EIGVEC = np.array([[-0.5675, 0.7192, 0.4009],
                       [-0.5808, -0.0045, -0.8140],
                       [-0.5836, -0.6948, 0.4203]], np.float32)


# ------------------------------------------------------------------ photometric

def color_normalize(img: np.ndarray,
                    mean: np.ndarray = IMAGENET_MEAN,
                    std: np.ndarray = IMAGENET_STD) -> np.ndarray:
    """(img - mean) / std per 3-channel frame group (transforms.lua:33-45)."""
    f = img.shape[-1] // 3
    return (img - np.tile(mean, f)) / np.tile(std, f)


def _grayscale_groups(img: np.ndarray) -> np.ndarray:
    """Per-group Rec601 luma replicated over the group's 3 channels
    (transforms.lua:227-235)."""
    h, w, c = img.shape
    g = img.reshape(h, w, c // 3, 3)
    luma = g[..., 0] * 0.299 + g[..., 1] * 0.587 + g[..., 2] * 0.114
    return np.repeat(luma[..., None], 3, axis=-1).reshape(h, w, c)


def _blend(a: np.ndarray, b: np.ndarray, alpha: float) -> np.ndarray:
    return a * alpha + b * (1.0 - alpha)


def jitter_brightness(img, var, rng):
    return _blend(img, np.zeros_like(img), 1.0 + rng.normal(0, var))


def jitter_contrast(img, var, rng):
    gs = _grayscale_groups(img)
    h, w, c = img.shape
    # each group blends toward the mean of its own gray channel
    means = gs.reshape(h, w, c // 3, 3)[..., 0].mean(axis=(0, 1))
    target = np.repeat(means, 3)[None, None, :] * np.ones_like(img)
    return _blend(img, target, 1.0 + rng.normal(0, var))


def jitter_saturation(img, var, rng):
    return _blend(img, _grayscale_groups(img), 1.0 + rng.normal(0, var))


def color_jitter(img: np.ndarray, rng: np.random.Generator,
                 brightness: float = 0.02, contrast: float = 0.02,
                 saturation: float = 0.02) -> np.ndarray:
    """Brightness/contrast/saturation in a random order
    (transforms.lua:292-328 with donkey.lua:161-166 strengths)."""
    ops = [lambda x: jitter_brightness(x, brightness, rng),
           lambda x: jitter_contrast(x, contrast, rng),
           lambda x: jitter_saturation(x, saturation, rng)]
    for i in rng.permutation(len(ops)):
        img = ops[i](img)
    return img


def pca_lighting(img: np.ndarray, rng: np.random.Generator,
                 alphastd: float = 0.1) -> np.ndarray:
    """AlexNet PCA lighting noise, same RGB shift added to every frame
    group (transforms.lua:195-217)."""
    if alphastd == 0:
        return img
    alpha = rng.normal(0, alphastd, size=3).astype(np.float32)
    rgb = (PCA_EIGVEC * alpha[None, :] * PCA_EIGVAL[None, :]).sum(axis=1)
    f = img.shape[-1] // 3
    return img + np.tile(rgb.astype(img.dtype), f)


def preprocess(img: np.ndarray, rng: np.random.Generator,
               normalize: bool = True) -> np.ndarray:
    """Training photometric pipeline (donkey.lua:158-179)."""
    img = color_jitter(img, rng)
    img = pca_lighting(img, rng)
    if normalize:
        img = color_normalize(img)
    return img


def gaussian_noise(img: np.ndarray, rng: np.random.Generator,
                   sigma: float) -> np.ndarray:
    """Additive noise with the reference's in-range *gate* — out-of-[0,1]
    pixels are zeroed, not clipped (donkey.lua:259-266)."""
    noisy = img + rng.standard_normal(img.shape).astype(img.dtype) * sigma
    gate = ((noisy >= 0) & (noisy <= 1)).astype(img.dtype)
    return noisy * gate


# ------------------------------------------------------------------ geometric

def rotate_nearest(img: np.ndarray, angle: float) -> np.ndarray:
    """Rotate (H,W,C) about the center, nearest sampling, zero fill —
    torch `image.rotate(..., 'simple')` semantics used by trainHook."""
    if angle == 0.0:
        return img
    h, w = img.shape[:2]
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ca, sa = np.cos(angle), np.sin(angle)
    xs = ca * (xx - cx) + sa * (yy - cy) + cx
    ys = -sa * (xx - cx) + ca * (yy - cy) + cy
    xi = np.round(xs).astype(np.int64)
    yi = np.round(ys).astype(np.int64)
    valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    out = np.zeros_like(img)
    out[valid] = img[yi[valid], xi[valid]]
    return out


def translate(img: np.ndarray, tx: float, ty: float) -> np.ndarray:
    """Integer-pixel translate with zero fill (torch image.translate)."""
    txi, tyi = int(round(tx)), int(round(ty))
    out = np.zeros_like(img)
    h, w = img.shape[:2]
    ys0, ys1 = max(0, tyi), min(h, h + tyi)
    xs0, xs1 = max(0, txi), min(w, w + txi)
    out[ys0:ys1, xs0:xs1] = img[ys0 - tyi:ys1 - tyi, xs0 - txi:xs1 - txi]
    return out


def rotation_flow_field(h: int, w: int, r2: float) -> np.ndarray:
    """Flow induced by an inter-frame rotation delta r2 about the image
    center (donkey.lua:297-305): u(y) = (y+1 - H/2)*r2, v(x) = -(x+1 - W/2)*r2
    (+1 keeps the reference's 1-based pixel convention)."""
    u = ((np.arange(h, dtype=np.float32) + 1.0) - h / 2.0) * r2
    v = -(((np.arange(w, dtype=np.float32) + 1.0) - w / 2.0) * r2)
    out = np.empty((h, w, 2), np.float32)
    out[..., 0] = u[:, None]
    out[..., 1] = v[None, :]
    return out


def rotate_flow_vectors(flow: np.ndarray, angle: float) -> np.ndarray:
    """Rotate flow *vectors* by -angle (donkey.lua:309-313)."""
    u, v = flow[..., 0], flow[..., 1]
    fu = np.cos(angle) * u + np.sin(angle) * v
    fv = -np.sin(angle) * u + np.cos(angle) * v
    return np.stack([fu, fv], axis=-1)


@dataclasses.dataclass
class GeometricParams:
    """Sampled augmentation parameters (for reproducibility/testing)."""
    hflip: bool
    vflip: bool
    tx: float
    ty: float
    r1: float
    r2: float
    scale: float
    crop_y: int
    crop_x: int


def sample_geometric(rng: np.random.Generator, ih: int, iw: int,
                     oh: int, ow: int) -> GeometricParams:
    """Sample the trainHook augmentation parameters (donkey.lua:276-351)."""
    hflip = rng.random() > 0.5
    vflip = rng.random() > 0.5
    tx, ty = 10.0 * rng.random(2)
    r1 = rng.uniform(-0.2, 0.2)
    r2 = rng.uniform(-0.1, 0.1)
    sc = rng.uniform(1.0, 2.0)
    sh, sw = int(round(ih * sc)), int(round(iw * sc))
    crop_y = int(np.floor(rng.uniform(1, max(sh - oh, 1 + 1e-6))))
    crop_x = int(np.floor(rng.uniform(1, max(sw - ow, 1 + 1e-6))))
    return GeometricParams(hflip, vflip, tx, ty, r1, r2, sc, crop_y, crop_x)


def augment_sample(frames: list, flow: np.ndarray, occ: np.ndarray,
                   mask: np.ndarray, params: GeometricParams,
                   ref0: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Apply the geometric augmentation (donkey.lua:269-354).

    frames: list of (H,W,3) images; ref0: 0-based reference frame index.
    Returns (images stacked HxWx3F, flow, occ, mask) after flips,
    rotation/translation, scale and crop — photometric jitter is applied
    by the caller afterwards, matching the reference order.
    """
    from .resample import resize

    h, w = frames[0].shape[:2]

    if params.hflip:
        frames = [f[:, ::-1] for f in frames]
        flow = flow[:, ::-1].copy()
        flow[..., 0] *= -1
        occ = occ[:, ::-1]
        mask = mask[:, ::-1]
    if params.vflip:
        frames = [f[::-1] for f in frames]
        flow = flow[::-1].copy()
        flow[..., 1] *= -1
        occ = occ[::-1]
        mask = mask[::-1]

    # rotation-induced flow, raster rotation, vector rotation
    flow = flow + rotation_flow_field(h, w, params.r2)
    flow = rotate_nearest(flow, params.r1)
    flow = rotate_flow_vectors(flow, params.r1)

    frames = list(frames)
    nf = len(frames)
    frames[ref0] = rotate_nearest(frames[ref0], params.r1)
    mask = rotate_nearest(mask[..., None] if mask.ndim == 2 else mask, params.r1)
    win = (nf - 1) // 2 if nf > 2 else 1
    for f in range(1, win + 1):
        if nf > 2:
            past = rotate_nearest(frames[ref0 - f], params.r1 - f * params.r2)
            frames[ref0 - f] = translate(past, -f * params.tx, -f * params.ty)
        if ref0 + f < nf:
            fut = rotate_nearest(frames[ref0 + f], params.r1 + f * params.r2)
            frames[ref0 + f] = translate(fut, f * params.tx, f * params.ty)

    flow = flow.copy()
    flow[..., 0] += params.tx
    flow[..., 1] += params.ty

    images = np.concatenate(frames, axis=-1)

    # random scale in [1,2): flow magnitudes scale with the raster
    # (donkey.lua:339-345)
    if params.scale != 1.0:
        sh, sw = int(round(h * params.scale)), int(round(w * params.scale))
        images = resize(images, sh, sw, "bilinear")
        mask = resize(mask, sh, sw, "bilinear")
        occ = resize(occ, sh, sw, "simple")
        flow = resize(flow, sh, sw, "bilinear") * params.scale

    return images, flow, occ, (mask[..., 0] if mask.ndim == 3 else mask)
