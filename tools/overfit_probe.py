#!/usr/bin/env python
"""One-batch overfit probe: the fastest end-to-end health check of the
optimizer + losses + model on real data.

Builds ONE fixed B=`--batch` batch through the real loader (with the
exact flags the learning demo trains under: compact wire, grad-clip,
demo LR) and Adam-steps it `--steps` times, printing loss/EPE every 25.
A healthy setup escapes the zero-flow saddle by step ~75 and reaches
EPE ~1.3 by step 400 (measured on the v5e, r4); a flat curve here means
a real defect, while a flat *full-dataset* run at the same step count
usually just means the shared-function gradient is slower than the
per-scene overfit direction (scene-diverse batches cancel each other's
constant-flow components near the zero-flow saddle — see
docs/evidence/learning_demo/).

    python tools/overfit_probe.py --data /root/roaming [--steps 400]

Reference for the recipe: /root/reference/README.md:83-87 (hard OBCC
pretrain), train.lua:66-92 (LR regime the demo overrides via public
flags).
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/root/roaming",
                    help="dataset root (<data>/datasets + <data>/data)")
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--wire", default="compact")
    ap.add_argument("--optimize", default="pme", choices=["pme", "epe"],
                    help="pme = the unsupervised hard OBCC recipe; epe = "
                         "supervised multiscale EPE on the generator's gt "
                         "(the reference's -optimize epe / -ground_truth "
                         "mode, opts.lua) — isolates the optimizer/loss "
                         "path from the photometric objective")
    ap.add_argument("--lr", default="0.0003")
    ap.add_argument("--grad_clip", default="500")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    from back2future_tpu.utils import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from back2future_tpu.config import parse_args
    from back2future_tpu.data import (FlowDataset, PrefetchLoader,
                                      SampleConfig, load_manifest,
                                      load_split)
    from back2future_tpu.losses import build_criterions
    from back2future_tpu.models.factory import model_and_config
    from back2future_tpu.train.checkpoint import load_or_convert
    from back2future_tpu.train.optim import lr_for_epoch
    from back2future_tpu.train.state import create_train_state
    from back2future_tpu.train.step import make_train_step

    data = Path(args.data)
    opt = parse_args([
        "--dataset", "RoamingImages", "--datasets_dir",
        str(data / "datasets"), "--data_root", str(data / "data"),
        "--ground_truth", "1", "--cache", "/tmp/overfit_probe",
        "--expName", "ob", "--batchSize", str(args.batch),
        "--epochSize", "1", "--nDonkeys", "0", "--wire", args.wire,
        "--optimize", args.optimize] + (
        ["--pme", "1", "--pme_criterion", "OBCC", "--smooth_flow", "2"]
        if args.optimize == "pme" else
        # the reference defaults -epe to 0.0 (opts.lua:60), so supervised
        # mode without an explicit weight multiplies the flow loss by
        # zero (train.lua:312-314) and only the occ head learns — a
        # parity-faithful footgun this tool must not reproduce
        ["--epe", "1"]) + [
        "--LR", args.lr, "--grad_clip",
        args.grad_clip, "--adam_reset_per_epoch", "0", "--nEpochs", "1"])

    np.random.seed(opt.manualSeed)
    model, _ = model_and_config(opt)
    crits = build_criterions(opt)
    params, _cfg, epoch0 = load_or_convert(opt)
    state = create_train_state(params, opt, epoch=epoch0)
    jitted = make_train_step(model, opt, crits).step_for_lr(
        lr_for_epoch(1, opt.LR))

    specs = load_manifest(data / "datasets" / "RoamingImages.dat",
                          ground_truth=True, root=str(data / "data"))
    train, _val = load_split(data / "datasets" / "RoamingImages_split.dat")
    ds = FlowDataset(specs, SampleConfig.from_options(opt), train,
                     train=True)
    loader = PrefetchLoader(ds, batch_size=args.batch, n_batches=1,
                            n_workers=0, manual_seed=opt.manualSeed)
    batch = {k: jnp.asarray(v) for k, v in next(iter(loader)).items()}

    t0 = time.time()
    for i in range(1, args.steps + 1):
        state, logs = jitted(state, batch)
        if i == 1:
            print(f"compile+first step {time.time() - t0:.1f}s", flush=True)
        if i % 25 == 0 or i == 1:
            # fetch as a stacked ARRAY — float() of a fresh device scalar
            # can hang through the TPU relay (see CLAUDE.md)
            vals = np.asarray(jnp.stack([logs["loss"], logs["epe"]]))
            print(f"step {i:4d} loss {vals[0]:10.3f} epe {vals[1]:7.4f}",
                  flush=True)
    print(f"done in {time.time() - t0:.1f}s  wire={args.wire} "
          f"clip={args.grad_clip} lr={args.lr}", flush=True)


if __name__ == "__main__":
    main()
