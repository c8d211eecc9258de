#!/usr/bin/env python
"""Convert a reference Torch7 .t7 checkpoint to a back2future_tpu one.

    python tools/convert_t7.py RoamingImages_H.t7 models/RoamingImages_H \
        [--frames 3 --levels 7 --skip 2 --past_flow 0]
    python tools/convert_t7.py model.t7 --inspect   # print module listing
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _force_cpu():
    """Checkpoint conversion is host work — never touch an accelerator
    (a sitecustomize-registered PJRT plugin may override JAX_PLATFORMS,
    so pin it via jax.config)."""
    import jax

    jax.config.update("jax_platforms", "cpu")


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("t7_path")
    ap.add_argument("out_dir", nargs="?")
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--levels", type=int, default=7)
    ap.add_argument("--skip", type=int, default=2)
    ap.add_argument("--past_flow", type=int, default=0)
    ap.add_argument("--inspect", action="store_true")
    args = ap.parse_args(argv)

    _force_cpu()
    from back2future_tpu.models.convert import convert_t7_checkpoint, inspect_t7

    if args.inspect:
        for line in inspect_t7(args.t7_path):
            print(line)
        return

    if not args.out_dir:
        ap.error("out_dir required unless --inspect")

    import dataclasses

    from back2future_tpu.config import Options
    from back2future_tpu.train.checkpoint import save_checkpoint
    from back2future_tpu.train.state import create_train_state

    params = convert_t7_checkpoint(
        args.t7_path, frames=args.frames, levels=args.levels,
        skip=args.skip, past_flow=bool(args.past_flow))
    opt = Options(frames=args.frames, levels=args.levels,
                  pwc_skip=args.skip, past_flow=bool(args.past_flow)).derive()
    state = create_train_state(params, opt)
    model_path, _ = save_checkpoint(args.out_dir, state, opt, epoch=0)
    print(f"wrote {model_path}")


if __name__ == "__main__":
    main()
