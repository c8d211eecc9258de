#!/usr/bin/env python
"""Inference demo — the reference README workflow
(/root/reference/README.md:54-71): load a frame window (one image per
model frame; 3 for the flagship models), compute flow and occlusions,
write flow.flo + flow visualization + occlusion masks.

    python tools/demo.py frame_0009.png frame_0010.png frame_0011.png \
        --model Ours-Soft-ft-KITTI --out out/ [--cpu]

With --model none, runs random weights (pipeline smoke test).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("frames", nargs="+",
                    help="one image per model frame (3 for the flagship "
                         "models; 2 or 5 for those variants)")
    ap.add_argument("--model", default="Ours-Soft-ft-KITTI")
    ap.add_argument("--out", default="out")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from back2future_tpu import io as fio
    from back2future_tpu.api import init
    from back2future_tpu.data.sample import default_image_loader
    from back2future_tpu.io.png16 import write_png

    ims = [default_image_loader(p) for p in args.frames]
    compute_flow = init(None if args.model == "none" else args.model)
    flow, fwd_occ, bwd_occ = compute_flow(*ims)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    fio.write_flo(out / "flow.flo", flow)
    rgb, mx = fio.xy2rgb(flow)
    write_png(out / "flow.png", (rgb * 255).astype(np.uint8))
    write_png(out / "fwd_occ.png", (fwd_occ * 255).astype(np.uint8))
    write_png(out / "bwd_occ.png", (bwd_occ * 255).astype(np.uint8))
    print(f"wrote {out}/flow.flo  flow.png (max|f|={mx:.3f})  "
          f"fwd_occ.png ({fwd_occ.mean():.3%} occluded)  bwd_occ.png")


if __name__ == "__main__":
    main()
