#!/usr/bin/env python
"""Standalone benchmark evaluation: AEPE / Fl-all / occlusion metrics over
a dataset split (the BASELINE.json "batched inference + eval" config; the
reference's equivalent is a `test()` pass, test.lua:33-312).

    python tools/eval.py --checkpoint models/RoamingImages_H_KITTI_S \
        --dataset Kitti2015 --datasets_dir datasets --data_root /data/kitti \
        [--split val|all] [--batchSize 4] [--limit N] [--cpu]

Prints one JSON line with the aggregate metrics.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--dataset", default="Kitti2015")
    ap.add_argument("--datasets_dir", default="datasets")
    ap.add_argument("--data_root", default="")
    ap.add_argument("--split", default="val", choices=["val", "train", "all"])
    ap.add_argument("--batchSize", type=int, default=4)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--cropHeight", type=int, default=0,
                    help="center-crop height (default: dataset eval size)")
    ap.add_argument("--cropWidth", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--dump_dir", default="",
                    help="also write per-sample predictions: KITTI-format "
                         "16-bit flow PNGs + raw-pixel .flo files, named "
                         "%%06d_10 by MANIFEST ROW (stable across --split/"
                         "--limit). Predictions are at the eval crop "
                         "resolution — for an actual benchmark submission "
                         "run with the dataset's full-resolution eval size "
                         "and map rows to the benchmark's frame ids")
    args = ap.parse_args(argv)

    import jax

    from back2future_tpu.utils import enable_compile_cache

    enable_compile_cache()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import numpy as np

    from back2future_tpu.config import Options
    from back2future_tpu.data import (FlowDataset, PrefetchLoader,
                                      SampleConfig, load_manifest, load_split)
    from back2future_tpu.models.factory import model_for_config
    from back2future_tpu.train.checkpoint import load_model_checkpoint
    from back2future_tpu.train.metrics import full_res_metrics

    params, cfg = load_model_checkpoint(args.checkpoint)
    model = model_for_config(cfg)

    opt = Options(dataset=args.dataset, ground_truth=True,
                  frames=cfg.frames, levels=cfg.levels,
                  cropHeight=args.cropHeight, cropWidth=args.cropWidth,
                  rand_crop=0).derive()
    scfg = SampleConfig.from_options(opt)
    specs = load_manifest(Path(args.datasets_dir) / f"{args.dataset}.dat",
                          ground_truth=True, root=args.data_root or None)
    split_path = Path(args.datasets_dir) / f"{args.dataset}_split.dat"
    if split_path.exists() and args.split != "all":
        tr, va = load_split(split_path)
        idx = va if args.split == "val" else tr
    else:
        idx = np.arange(len(specs))
    if args.limit:
        idx = idx[:args.limit]

    ds = FlowDataset(specs, scfg, idx, train=False)
    # ceil: the final partial batch is evaluated too (and weighted by its
    # true size below) so the aggregate covers the whole split
    n_batches = -(-len(ds) // args.batchSize)
    # thread workers: by this point JAX/PJRT threads are live (checkpoint
    # load above), so the default POSIX fork pool risks a child deadlock
    # (see CLAUDE.md loader notes); eval decoding is light, threads keep up
    loader = PrefetchLoader(ds, args.batchSize, n_batches, n_workers=4,
                            sequential=True, worker_mode="thread")

    @jax.jit
    def metrics_step(params, batch):
        from back2future_tpu.data.wire import decode_batch
        batch = decode_batch(batch)  # no-op for the default f32 wire
        outs = model.apply({"params": params}, batch["images"])
        g0 = outs[0]
        metrics = full_res_metrics(
            g0["flow"].astype("float32"),
            None if g0["occ"] is None else g0["occ"].astype("float32"),
            batch, cfg.flownet_factor, size_average=False)
        return metrics, g0["flow"].astype("float32")

    dump = Path(args.dump_dir) if args.dump_dir else None
    if dump:
        from back2future_tpu.io.flow_io import write_flo, write_kitti_png

        dump.mkdir(parents=True, exist_ok=True)

    rows, weights, seen = [], [], 0
    for batch in loader:
        logs, flows = metrics_step(params, batch)
        rows.append({k: float(v) for k, v in logs.items()})
        weights.append(batch["images"].shape[0])
        if dump:
            px = np.asarray(flows, np.float32) * cfg.flownet_factor
            for i in range(batch["images"].shape[0]):
                row = int(idx[seen + i])  # manifest row (sequential loader)
                write_kitti_png(dump / f"{row:06d}_10.png", px[i])
                write_flo(dump / f"{row:06d}_10.flo", px[i])
        seen += int(batch["images"].shape[0])
    w = np.asarray(weights, np.float64)
    agg = {k: float(np.average([r[k] for r in rows], weights=w))
           for k in rows[0]}
    agg["n_samples"] = int(w.sum())
    print(json.dumps(agg))


if __name__ == "__main__":
    main()
