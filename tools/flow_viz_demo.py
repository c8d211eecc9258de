#!/usr/bin/env python
"""Render qualitative evidence images for a trained checkpoint: per val
scene a 2x2 panel — reference frame, predicted flow (xy2rgb, the
reference's flowToColor convention, flowExtensions.lua:129-150), ground
truth flow on the same color scale, and the predicted forward-occlusion
mask — written as PNGs.

    python tools/flow_viz_demo.py --checkpoint <ckpt> --data /tmp/roaming \
        --out docs/evidence/learning_demo/viz --n 3
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--data", default="/tmp/roaming")
    ap.add_argument("--dataset", default="RoamingImages")
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    from back2future_tpu.utils import enable_compile_cache

    enable_compile_cache()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from back2future_tpu.config import Options
    from back2future_tpu.data import (FlowDataset, SampleConfig,
                                      load_manifest, load_split)
    from back2future_tpu.io.png16 import write_png
    from back2future_tpu.io.viz import xy2rgb
    from back2future_tpu.models.factory import model_for_config
    from back2future_tpu.train.checkpoint import load_model_checkpoint
    from back2future_tpu.ops.pyramid import resize_bilinear

    params, cfg = load_model_checkpoint(args.checkpoint)
    model = model_for_config(cfg)

    data = Path(args.data)
    opt = Options(dataset=args.dataset, ground_truth=True, frames=cfg.frames,
                  levels=cfg.levels, rand_crop=0).derive()
    specs = load_manifest(data / "datasets" / f"{args.dataset}.dat",
                          ground_truth=True, root=str(data / "data"))
    _, val = load_split(data / "datasets" / f"{args.dataset}_split.dat")
    ds = FlowDataset(specs, SampleConfig.from_options(opt), val[:args.n],
                     train=False)
    batch = ds.get(0, min(args.n, len(ds)))

    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x)[0])
    g = fwd(params, batch["images"])
    flow = np.asarray(g["flow"], np.float32) * cfg.flownet_factor
    occ = None if g["occ"] is None else np.asarray(g["occ"], np.float32)

    H, W = batch["images"].shape[1:3]
    if flow.shape[1:3] != (H, W):  # finest level is 1/4 res: upsample
        import jax.numpy as jnp

        sc = H / flow.shape[1]
        flow = np.asarray(resize_bilinear(jnp.asarray(flow), H, W)) * sc
        if occ is not None:
            occ = np.asarray(resize_bilinear(jnp.asarray(occ), H, W))

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    # un-normalize the reference frame for display (ImageNet mean/std)
    from back2future_tpu.data.augment import IMAGENET_MEAN, IMAGENET_STD
    from back2future_tpu.train.metrics import decode_occ

    ref = cfg.frames // 2 if cfg.frames == 2 else (cfg.frames - 1) // 2
    for i in range(flow.shape[0]):
        img = (batch["images"][i, ..., 3 * ref:3 * ref + 3] * IMAGENET_STD
               + IMAGENET_MEAN)
        gt = batch["flow_gt"][i] * cfg.flownet_factor
        max_norm = float(np.hypot(gt[..., 0], gt[..., 1]).max()) or None
        pred_rgb, _ = xy2rgb(flow[i], max_norm)  # float RGB in [0,1]
        gt_rgb, _ = xy2rgb(gt, max_norm)
        occ_img = (np.zeros((H, W, 3), np.float32) if occ is None else
                   np.repeat(np.asarray(decode_occ(occ[i]))[..., None],
                             3, -1).astype(np.float32))
        top = np.concatenate([np.clip(img, 0, 1), pred_rgb], 1)
        bot = np.concatenate([gt_rgb, occ_img], 1)
        panel = (np.concatenate([top, bot], 0) * 255).astype(np.uint8)
        write_png(out / f"val{i:02d}_panel.png", panel)
        epe = float(np.mean(np.hypot(*(flow[i] - gt).transpose(2, 0, 1))))
        print(f"val{i:02d}: EPE {epe:.3f} px -> {out}/val{i:02d}_panel.png",
              flush=True)


if __name__ == "__main__":
    main()
