"""Multi-scale loss assembly over the model's level outputs.

Rebuilds the reference's feval loss wiring (train.lua:227-483) as a pure
scalar loss of the model outputs; gradients reach the model through JAX
autodiff + the criterions' reference-parity custom VJPs instead of
hand-assembled gradOutputs slots.

Level weights: finest -> coarsest {0.005, 0.01, 0.02, 0.08, 0.32, 0.64,
1.28} (train.lua:56-58); all ones when sizeAverage (train.lua:60-64).

Known reference defects NOT replicated (documented intent implemented
instead): the supervised occlusion loss as written would index a 1-channel
tensor out of bounds and pass a tensor where L2Criterion expects a
{flow, mask} table (train.lua:285,319-331); we apply the intended
conversion (0/0.5/1 three-state -> per-channel {1, 0.5, 0} soft targets)
and an all-ones mask.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from ..ops import avg_pool2, subsample2

LEVEL_WEIGHTS = (0.005, 0.01, 0.02, 0.08, 0.32, 0.64, 1.28)


def level_weight(l: int, size_average: bool) -> float:
    return 1.0 if size_average else LEVEL_WEIGHTS[l]


def _ref_channels(frames: int) -> int:
    """First channel of the reference frame in the stacked input
    (train.lua:236-238)."""
    ref = 1 if frames == 2 else (frames + 1) // 2
    return (ref - 1) * 3


def convert_gt_occ(occ_gt: jax.Array) -> jax.Array:
    """3-state gt (0 bwd / 0.5 vis / 1 fwd) -> 2-channel soft targets
    (intent of train.lua:319-326). occ_gt: (B,H,W,1) or (B,H,W)."""
    if occ_gt.ndim == 4:
        occ_gt = occ_gt[..., 0]
    ch1 = (occ_gt == 0.0).astype(jnp.float32) + 0.5 * (occ_gt == 0.5)
    ch2 = (occ_gt == 1.0).astype(jnp.float32) + 0.5 * (occ_gt == 0.5)
    return jnp.stack([ch1, ch2], axis=-1)


def multiscale_loss(outputs: List[Dict[str, Any]], batch: Dict[str, Any],
                    opt, crits) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Returns (total_loss, component dict).

    batch keys: 'images' (B,H,W,3F) normalized stacked frames;
    optionally 'flow_gt' (B,H,W,2) [already / flownet_factor],
    'occ_gt' (B,H,W,2) [channels: frames-occ, 3-frame-occ],
    'mask' (B,H,W).
    """
    frames = opt.frames
    rc = _ref_channels(frames)
    # criterions always run in float32, whatever the model compute dtype
    to_f32 = lambda x: x.astype(jnp.float32) if isinstance(x, jax.Array) else x
    outputs = jax.tree_util.tree_map(to_f32, outputs)
    batch = jax.tree_util.tree_map(to_f32, batch)
    n_levels = len(outputs)
    comps = {k: jnp.zeros(()) for k in
             ("pme", "sflow", "socc", "gocc", "sup_flow", "sup_occ")}

    multi_occ = frames > 2 and not opt.no_occ

    if opt.optimize == "epe":
        flow_ds = batch["flow_gt"]
        mask_ds = batch["mask"][..., None] if batch["mask"].ndim == 3 else batch["mask"]
        occ_ds = batch["occ_gt"][..., :1]
        for l in range(n_levels):
            if l > 0:
                flow_ds = subsample2(flow_ds)
                mask_ds = subsample2(mask_ds)
                if opt.rescale_flow == 1:
                    flow_ds = flow_ds / 2.0
                if multi_occ:
                    occ_ds = subsample2(occ_ds)
            w = level_weight(l, opt.sizeAverage)
            g = outputs[l]

            sup, _ = crits.l2(g["flow"], flow_ds, mask_ds[..., 0])
            comps["sup_flow"] = comps["sup_flow"] + opt.epe * w * sup

            if multi_occ:
                occ_target = convert_gt_occ(occ_ds)
                ones = jnp.ones(occ_target.shape[:3], occ_target.dtype)
                # L2 over the 2-channel occ as a "flow" pair (intended
                # semantics of train.lua:328-331)
                sup_occ, _ = crits.l2(g["occ"], occ_target, ones)
                comps["sup_occ"] = comps["sup_occ"] + w * sup_occ

    if opt.optimize == "pme":
        down = batch["images"]
        for l in range(n_levels):
            if l > 0:
                down = avg_pool2(down)
            w = level_weight(l, opt.sizeAverage)
            g = outputs[l]
            target = down[..., rc: rc + 3]
            scale = g["flow_scale"]

            # flow smoothness on each predicted flow field (train.lua:427-433)
            flows = [g["flow"]] + ([g["flow_past"]] if (opt.past_flow and g["flow_past"] is not None) else [])
            for fl in flows:
                comps["sflow"] = comps["sflow"] + \
                    w * opt.smooth_flow * crits.flow_smooth(fl, target)

            # constant velocity (train.lua:435-441)
            if opt.past_flow and g["flow_past"] is not None:
                comps["sflow"] = comps["sflow"] + \
                    w * opt.const_vel * crits.const_vel(g["flow"], g["flow_past"])

            # photometric (train.lua:443-454)
            pme_fn = crits.pme(scale)
            comps["pme"] = comps["pme"] + w * opt.pme * pme_fn(
                g["flow"], g["flow_past"], g["occ"], tuple(g["warped"]), target)

            if multi_occ:
                if opt.smooth_occ > 0:
                    comps["socc"] = comps["socc"] + \
                        w * opt.smooth_occ * crits.occ_smooth(g["occ"], target)
                if opt.prior_occ > 0:
                    comps["gocc"] = comps["gocc"] + \
                        w * opt.prior_occ * crits.occ_prior(g["occ"], target)

    total = sum(comps.values())
    return total, comps
