"""Compact host->device wire format for training batches.

The reference copies full float CudaTensors host->device every batch
(train.lua:206-208) — on its single-machine PCIe that is cheap. On a TPU
host the H2D link (and host RAM traffic) is still a real per-step cost,
and through a remote-relay dev setup it is THE bottleneck: a default
320x640 B=8 float32 batch is ~85 MB. `--wire compact` ships the batch in
its information-carrying width instead (~26 MB, 3.3x smaller):

  * images  — uint8. Sources are 8-bit PNGs, so for the non-augmented
    pipeline this is bit-exact; ImageNet normalization (donkey.lua:35-38)
    is deferred to the device and fused into the jitted step. With
    -augment 1 or -gaussian_noise the jittered floats are re-quantized
    to the source's own 8-bit grid (error <= 1/510, clipped to [0,1]).
  * flow_gt — float16 (values are prescaled by 1/flownet_factor=0.05,
    so |flow| < ~25/20; f16 resolution there is ~5e-4 px post-rescale).
    The gt flow only feeds evaluation metrics under -optimize pme.
  * occ_gt  — float16 (3-state {0, 0.5, 1} maps, exact in f16).
  * mask    — uint8 (0/1 valid mask, exact).

`decode_batch` runs INSIDE the jitted step: XLA fuses the u8->f32
convert + normalize into the first convolution's input, so the device
cost is nil. `--wire f32` (the default) keeps the reference-parity
host-side pipeline byte-for-byte.

Constraint: compact requires -normalize_images 1 (the default). The
testHook normalizes unconditionally (donkey.lua:510) while the trainHook
honors the flag, so with -normalize_images 0 the deferred device-side
normalization could not distinguish the two; config.derive() rejects the
combination.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from .augment import IMAGENET_MEAN, IMAGENET_STD

WIRE_FORMATS = ("f32", "compact")


def encode_batch(batch: Dict[str, np.ndarray], wire: str) -> Dict[str, np.ndarray]:
    """Host-side: pack an UNNORMALIZED float batch (images in [0,1]) into
    the compact wire dtypes. No-op for wire='f32' (whose images are
    already host-normalized)."""
    if wire == "f32":
        return batch
    if wire != "compact":
        raise ValueError(f"unknown wire format {wire!r} (use {WIRE_FORMATS})")
    out = dict(batch)
    out["images"] = np.clip(np.rint(batch["images"] * 255.0), 0, 255).astype(np.uint8)
    if "flow_gt" in batch:
        out["flow_gt"] = batch["flow_gt"].astype(np.float16)
    if "occ_gt" in batch:
        out["occ_gt"] = batch["occ_gt"].astype(np.float16)
    if "mask" in batch:
        out["mask"] = np.rint(batch["mask"]).astype(np.uint8)
    return out


def decode_batch(batch) -> Dict:
    """Device-side (jit-traceable): undo `encode_batch`, applying the
    deferred ImageNet normalization per 3-channel group
    (augment.color_normalize semantics, donkey.lua:35-38). A f32-wire
    batch passes through untouched, so every step can call this
    unconditionally."""
    import jax.numpy as jnp

    images = batch["images"]
    if images.dtype != jnp.uint8:
        return batch
    nf = images.shape[-1] // 3
    mean = jnp.tile(jnp.asarray(IMAGENET_MEAN, jnp.float32).reshape(-1), nf)
    std = jnp.tile(jnp.asarray(IMAGENET_STD, jnp.float32).reshape(-1), nf)
    out = dict(batch)
    out["images"] = (images.astype(jnp.float32) / 255.0 - mean) / std
    for k in ("flow_gt", "occ_gt", "mask"):
        if k in batch:
            out[k] = batch[k].astype(jnp.float32)
    return out
