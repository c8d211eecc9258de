#!/usr/bin/env python
"""Capture and summarize a device profile of the flagship forward (or
training step): the jax.profiler workflow used to drive this framework's
optimization, packaged (see BENCHMARKS.md for the numbers it produced).

    python tools/profile.py [--train] [--batch 8] [--height 320]
        [--width 1216] [--iters 3] [--trace_dir /tmp/b2f-trace]

Prints the top device ops by total time. Works on the real TPU; on CPU it
profiles host execution (less informative).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def summarize(trace_dir: str, top: int = 25) -> None:
    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        print("no trace found", file=sys.stderr)
        return
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    events = data["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, n in pids.items() if "TPU" in n or "GPU" in n}
    if not dev:
        dev = set(pids)
    tot = collections.Counter()
    cnt = collections.Counter()
    meta = {}
    cat = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev:
            tot[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
            args = e.get("args", {})
            if e["name"] not in meta:
                meta[e["name"]] = args
            cat[args.get("hlo_category", "?")] += e.get("dur", 0)
    print("device time by HLO category (total ms across iterations):")
    for name, us in cat.most_common():
        print(f"  {us/1000:9.2f} ms  {name}")
    print(f"top {top} device ops (total ms across profiled iterations):")
    for name, us in tot.most_common(top):
        args = meta.get(name, {})
        long = args.get("long_name", "")
        # "%fusion.7 = bf16[194560,128]{...} fusion(bf16[8,80,304,128]{...}"
        sig = " ".join(p.split("{")[0] for p in long.split(" ") if "[" in p)[:90]
        print(f"  {us/1000:9.2f} ms x{cnt[name]:5d}  {name[:40]:40s} "
              f"{args.get('hlo_category', ''):22s} {sig}")


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--width", type=int, default=1216)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--trace_dir", default="/tmp/b2f-trace")
    ap.add_argument("--no_pallas", action="store_true")
    ap.add_argument("--frames", type=int, default=3)
    args = ap.parse_args(argv)

    import numpy as np
    import jax

    from back2future_tpu.utils import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from back2future_tpu.config import Options
    from back2future_tpu.models.pwc import PWCNet, pwc_config_from_options

    opt = Options(optimize="pme", compute_dtype="bfloat16",
                  use_pallas=not args.no_pallas, batchSize=args.batch,
                  frames=args.frames).derive()
    model = PWCNet(pwc_config_from_options(opt))
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 128, 3 * opt.frames)))["params"]
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(args.batch, args.height, args.width,
                              3 * opt.frames).astype(np.float32))

    if args.train:
        from back2future_tpu.losses import build_criterions
        from back2future_tpu.train.state import create_train_state
        from back2future_tpu.train.step import make_train_step

        crits = build_criterions(opt)
        state = create_train_state(params, opt)
        step = make_train_step(model, opt, crits, donate=False)
        batch = {"images": x}
        state, logs = step(state, batch)
        np.asarray(logs["loss"])

        def run_once():
            nonlocal state
            state, logs = step(state, batch)
            return logs["loss"]
    else:
        fwd = jax.jit(lambda p, x: model.apply({"params": p}, x)[0]["flow"])
        np.asarray(fwd(params, x))

        def run_once():
            return fwd(params, x)

    jax.profiler.start_trace(args.trace_dir)
    out = None
    for _ in range(args.iters):
        out = run_once()
    np.asarray(out)
    jax.profiler.stop_trace()
    summarize(args.trace_dir)


if __name__ == "__main__":
    main()
