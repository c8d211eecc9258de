#!/usr/bin/env python
"""Training-step throughput: wall ms/step (bench.py methodology: queued
dispatch, best of several windows) for the pme step at training crops.

    python tools/train_bench.py [--batch 8] [--height 320] [--width 640]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--width", type=int, default=640)
    args = ap.parse_args(argv)

    import numpy as np
    import jax

    from back2future_tpu.utils import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from back2future_tpu.config import Options
    from back2future_tpu.losses import build_criterions
    from back2future_tpu.models.pwc import PWCNet, pwc_config_from_options
    from back2future_tpu.train.state import create_train_state
    from back2future_tpu.train.step import make_train_step

    opt = Options(optimize="pme", compute_dtype="bfloat16",
                  batchSize=args.batch).derive()
    model = PWCNet(pwc_config_from_options(opt))
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 128, 3 * opt.frames)))["params"]
    crits = build_criterions(opt)
    state = create_train_state(params, opt)
    step = make_train_step(model, opt, crits, donate=False)
    rng = np.random.RandomState(0)
    batch = {"images": jnp.asarray(rng.randn(
        args.batch, args.height, args.width, 3 * opt.frames).astype(np.float32))}

    state, logs = step(state, batch)
    np.asarray(logs["loss"])

    def window(n):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, logs = step(state, batch)
        np.asarray(logs["loss"])
        return (time.perf_counter() - t0) / n * 1000

    window(5)  # warm-up
    best = min(window(n) for n in (15, 10, 10))
    print(f"train step ({args.batch},{args.height},{args.width}): "
          f"{best:.1f} ms/step wall = "
          f"{args.batch / best * 1000:.1f} triplets/s trained")


if __name__ == "__main__":
    main()
