"""Export an AOT serving artifact for the inference API.

Wraps `FlowEstimator.export()`: loads a checkpoint (or a reference
pretrained name already converted with tools/convert_t7.py), exports the
jitted forward for the requested (batch, height, width) buckets as
self-contained StableHLO, ready for `api.load_exported()` in a serving
process with no model code or checkpoint access. Going beyond the
reference, whose serving story is torch.load of the whole .t7 graph
(back2future.lua:113-116).

Usage:
  python tools/export_serving.py --model <ckpt-or-name> --out art/ \
      --sizes 375x1242 16x375x1242
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_size(s: str):
    parts = [int(p) for p in s.lower().split("x")]
    if len(parts) == 2:
        return (parts[0], parts[1])
    if len(parts) == 3:
        return (parts[0], parts[1], parts[2])
    raise argparse.ArgumentTypeError(
        f"{s!r}: expected HxW or BxHxW (e.g. 375x1242 or 16x375x1242)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None,
                    help="checkpoint path or pretrained name; default: "
                         "random weights (smoke)")
    ap.add_argument("--out", required=True, help="artifact directory")
    ap.add_argument("--sizes", nargs="+", type=parse_size,
                    default=[(375, 1242)],
                    help="buckets as HxW or BxHxW (input resolutions; "
                         "snapped down to the /64 grid)")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    args = ap.parse_args()

    from back2future_tpu import api

    cf = api.init(args.model, dtype=args.dtype)
    cf.export(args.out, args.sizes)
    arts = sorted(p.name for p in Path(args.out).iterdir())
    print(f"exported {len(args.sizes)} bucket(s) to {args.out}:")
    for a in arts:
        print(" ", a)


if __name__ == "__main__":
    main()
