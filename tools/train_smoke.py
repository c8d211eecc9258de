"""End-to-end training smoke on real hardware: dataset on disk ->
manifest -> main.py CLI -> epochs with the full loader/device pipeline.

Generates a synthetic KITTI-sized dataset (reusing loader_bench's
generator), writes a `<name>.dat` manifest + split into a temp datasets
dir, then drives the actual CLI (`main.py`) for a couple of short pme
epochs — the whole system (manifest parsing, prefetch loader with
augmentation, device prefetch, jitted train step, console/TSV logging,
checkpointing, SVG plots) against whatever backend JAX resolves (the
real TPU under the default env). Prints the resulting artifacts and the
steady-state wall throughput line for the evidence ledger.

Usage: python tools/train_smoke.py [--epochs 2] [--epoch_size 12]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    from loader_bench import make_dataset

    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--epoch_size", type=int, default=12)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--workers", type=int, default=0)
    ap.add_argument("--frames", type=int, default=3,
                    help="training window (2, 3, 5, ...); the synthetic "
                         "dataset is generated with this many frames")
    ap.add_argument("--cropWidth", type=int, default=640)
    ap.add_argument("--cropHeight", type=int, default=320,
                    help="e.g. 384 for the Sintel training shape "
                         "(opts.lua:125-130)")
    ap.add_argument("--recipe", default="hard", choices=["hard", "soft"],
                    help="hard = OBCC + flow/occ smoothness (the KITTI "
                         "pretrain surface); soft = OBGCC + past_flow + "
                         "const_vel + second-order smoothness (the Sintel "
                         "fine-tune surface, README.md:98-103)")
    ap.add_argument("--keep", default="", help="copy the save dir here")
    args = ap.parse_args()

    repo = Path(__file__).resolve().parent.parent
    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        # source frames must cover the crop; Sintel-shape smokes (crop
        # 384 px tall) need Sintel-sized (436x1024) frames, not KITTI's
        h, w = ((436, 1024) if args.cropHeight > 375 else (375, 1242))
        man = make_dataset(root / "data", n_seqs=24, frames=args.frames,
                           height=h, width=w)
        ds_dir = root / "datasets"
        ds_dir.mkdir()
        (ds_dir / "Smoke.dat").write_text(man.read_text())
        # 16 train / 8 val (val must cover >= one batch or the eval
        # epoch is skipped, loop.build_loaders)
        (ds_dir / "Smoke_split.dat").write_text(
            "".join("2\n" if i % 3 == 0 else "1\n" for i in range(24)))
        save = root / "run" / "smoke"

        if args.recipe == "hard":
            loss_flags = ["--pme_criterion", "OBCC",
                          "--smooth_flow", "0.1", "--smooth_occ", "0.1",
                          "--prior_occ", "0.1"]
        else:
            loss_flags = ["--pme", "4", "--pme_criterion", "OBGCC",
                          "--pme_alpha", "1", "--pme_beta", "0",
                          "--pme_gamma", "0", "--past_flow", "1",
                          "--smooth_flow", "0.1",
                          "--smooth_second_order", "1",
                          "--const_vel", "0.0001"]
        cmd = [sys.executable, str(repo / "main.py"),
               "--dataset", "Smoke",
               "--datasets_dir", str(ds_dir),
               "--cache", str(root / "run"), "--expName", "smoke",
               "--optimize", "pme", *loss_flags,
               "--frames", str(args.frames),
               "--cropWidth", str(args.cropWidth),
               "--cropHeight", str(args.cropHeight),
               "--batchSize", str(args.batch),
               "--nDonkeys", str(args.workers),
               "--nEpochs", str(args.epochs),
               "--epochSize", str(args.epoch_size),
               "--epochStore", "1"]
        print("+", " ".join(cmd[1:]), flush=True)
        t0 = time.time()
        rc = subprocess.run(cmd, cwd=repo).returncode
        dt = time.time() - t0
        if rc != 0:
            sys.exit(rc)

        arts = sorted(p.relative_to(save).as_posix()
                      for p in save.rglob("*") if p.is_file())
        print(f"\nwall {dt:.1f}s for {args.epochs}x{args.epoch_size} "
              f"batches of {args.batch} (incl. compile)")
        print("artifacts:", ", ".join(arts))
        required = {"log", "train.log", "test.log",
                    f"model_{args.epochs}.msgpack",
                    f"optimState_{args.epochs}.msgpack"}
        missing = required - set(arts)
        if missing:
            print("MISSING:", missing)
            sys.exit(1)
        if args.keep:
            import shutil
            shutil.copytree(save, args.keep, dirs_exist_ok=True)
        print("train_smoke: ok")


if __name__ == "__main__":
    main()
