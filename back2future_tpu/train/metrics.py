"""Evaluation metrics (train.lua:337-414; test.lua:183-262).

Full-resolution EPE (x flownet_factor), EPE split into occluded /
non-occluded regions, and occlusion accuracy (overall + per-state) with the
reference's three decoding schemes by predicted-occ channel count.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..losses.supervised import epe_map


def decode_occ(occ_pred: jax.Array) -> jax.Array:
    """Predicted occ map -> sharp 3-state {0, 0.5, 1} (train.lua:379-389)."""
    c = occ_pred.shape[-1]
    if c == 1:
        return jnp.round(occ_pred[..., 0] * 2.0) / 2.0
    if c == 3:
        return (jnp.argmax(occ_pred, axis=-1).astype(jnp.float32)) / 2.0
    # 2-channel softmax head: round((1 - occ1) + occ2) * 0.5
    return jnp.round((1.0 - occ_pred[..., 0]) + occ_pred[..., 1]) * 0.5


def _safe_mean(values: jax.Array, mask: jax.Array) -> jax.Array:
    n = jnp.sum(mask)
    return jnp.where(n > 0, jnp.sum(values * mask) / jnp.maximum(n, 1.0), 0.0)


def fl_all(epe_px: jax.Array, flow_gt_px: jax.Array,
           mask: jax.Array) -> jax.Array:
    """KITTI Fl-all outlier rate: EPE > 3 px AND > 5% of gt magnitude
    (the benchmark the reference reports against; not computed in-repo)."""
    mag = jnp.sqrt(jnp.sum(flow_gt_px ** 2, axis=-1))
    outlier = ((epe_px > 3.0) & (epe_px > 0.05 * mag)).astype(epe_px.dtype)
    return _safe_mean(outlier, mask)


def occ_f1(occ_pred_sharp: jax.Array, occ_label: jax.Array) -> jax.Array:
    """F1 of occlusion detection: positive = not visible (label != 0.5)."""
    pred = occ_pred_sharp != 0.5
    gt = occ_label != 0.5
    tp = jnp.sum((pred & gt).astype(jnp.float32))
    fp = jnp.sum((pred & ~gt).astype(jnp.float32))
    fn = jnp.sum((~pred & gt).astype(jnp.float32))
    return 2 * tp / jnp.maximum(2 * tp + fp + fn, 1.0)


def full_res_metrics(flow_pred: jax.Array, occ_pred, batch: Dict,
                     flownet_factor: float, size_average: bool) -> Dict[str, jax.Array]:
    """Metrics on the finest-level outputs vs full-res ground truth.

    batch: 'flow_gt' (B,H,W,2) (already / flownet_factor), 'occ_gt'
    (B,H,W,2) with channel 0 = frames-occ label, channel 1 = 3-frame occ
    (train.lua:346,392), 'mask' (B,H,W).
    """
    mask = batch["mask"]
    m = epe_map(flow_pred, batch["flow_gt"], mask)
    npix = jnp.sum(mask)
    epe = jnp.sum(m) / jnp.maximum(npix, 1.0) * flownet_factor

    # occ/non-occ split uses the 3-frame occlusion labels (train.lua:346-375)
    lbl3 = batch["occ_gt"][..., 1]
    vis = (lbl3 == 0.5).astype(m.dtype)
    occluded = 1.0 - vis
    epe_nocc = _safe_mean(m * flownet_factor, vis * mask)
    epe_occ = _safe_mean(m * flownet_factor, occluded * mask)

    out = {"epe": epe, "epe_nocc": epe_nocc, "epe_occ": epe_occ,
           "fl_all": fl_all(m * flownet_factor,
                            batch["flow_gt"] * flownet_factor, mask)}

    if occ_pred is not None:
        sharp = decode_occ(occ_pred)
        lbl = batch["occ_gt"][..., 0]
        correct = (sharp == lbl).astype(m.dtype)
        out["occ_acc"] = jnp.mean(correct)
        out["occ_acc_bwd"] = _safe_mean(correct, (lbl == 0.0).astype(m.dtype))
        out["occ_acc_vis"] = _safe_mean(correct, (lbl == 0.5).astype(m.dtype))
        out["occ_acc_fwd"] = _safe_mean(correct, (lbl == 1.0).astype(m.dtype))
        out["occ_f1"] = occ_f1(sharp, lbl)
    return out
