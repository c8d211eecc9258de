"""Host data-path throughput benchmark (the donkey-pool analog).

Synthesizes a KITTI-sized dataset on disk (375x1242 PNG triplets),
then measures PrefetchLoader steady-state throughput through the full
trainHook path — decode, augmentation (coupled flips/rotations/scale
with flow corrections via the native C++ resampler), jitter, normalize,
crop — at the training configuration (320x640 crops, batch 8). The
number to beat is the device step rate: the v5e pme train step consumes
~95 triplets/s (BENCHMARKS.md), so the loader keeps the device fed as
long as it clears that.

Reference analog: 8 donkey threads running donkey.lua:183-392.
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_dataset(root: Path, n_seqs: int, frames: int = 3,
                 height: int = 375, width: int = 1242) -> Path:
    from back2future_tpu.io.png16 import write_png

    rng = np.random.default_rng(0)
    img_dir = root / "image_2"
    img_dir.mkdir(parents=True)
    base = (rng.random((height, width, 3)) * 255).astype(np.uint8)
    for s in range(n_seqs):
        for f in range(frames):
            # roll a shared base image so frames differ but encode fast
            write_png(img_dir / f"{s:06d}_{f:02d}.png",
                      np.roll(base, s * 7 + f * 3, axis=1))
    man = root / "bench.dat"
    # reference frame = the window center (frames are written 0-based,
    # so frames=3 -> ref 1, frames=5 -> ref 2), matching donkey.lua's
    # ref +/- (opt.frames-1)/2 window
    man.write_text("".join(
        f"{img_dir}/{s:06d}_%02d.png {frames // 2}\n" for s in range(n_seqs)))
    return man


def main() -> None:
    from back2future_tpu.config import Options
    from back2future_tpu.data import (FlowDataset, PrefetchLoader,
                                      SampleConfig, load_manifest)

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--batches", type=int, default=40)
    ap.add_argument("--seqs", type=int, default=24)
    ap.add_argument("--no_augment", action="store_true")
    ap.add_argument("--mode", default="auto",
                    choices=["auto", "process", "thread"])
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        man = make_dataset(root, args.seqs)
        opt = Options(dataset="Kitti2015", augment=0 if args.no_augment else 1,
                      batchSize=args.batch, nDonkeys=args.workers).derive()
        specs = load_manifest(man, ground_truth=False)
        ds = FlowDataset(specs, SampleConfig.from_options(opt),
                         np.arange(len(specs)), train=True)
        loader = PrefetchLoader(ds, args.batch, n_batches=args.batches,
                                n_workers=args.workers, manual_seed=1,
                                worker_mode=args.mode)

        # one warm-up epoch (thread spin-up, native-lib build/load)
        for i, b in enumerate(iter(loader)):
            if i >= 4:
                break
        t0 = time.perf_counter()
        n = 0
        for batch in iter(loader):
            assert batch["images"].shape == (args.batch, opt.fineHeight,
                                             opt.fineWidth, 9)
            n += args.batch
        dt = time.perf_counter() - t0
        print(f"{n} samples in {dt:.2f}s = {n / dt:.1f} triplets/s "
              f"({args.workers} workers [{args.mode}], "
              f"augment={not args.no_augment}, "
              f"{opt.fineHeight}x{opt.fineWidth} crops)")


if __name__ == "__main__":
    main()
