#!/usr/bin/env python
"""Training-step throughput: wall ms/step (bench.py methodology: queued
dispatch, best of several windows) for the pme step at training crops.

    python tools/train_bench.py [--batch 8] [--height 320] [--width 640]

--stream device (default) re-dispatches one pre-staged device batch —
isolates chip + dispatch cost, the ledger's historical number.
--stream host feeds a FRESH host numpy batch every step (device_put per
step), the real train-loop condition where host->device bandwidth is on
the clock; combine with --wire compact to measure the compact wire
format's H2D saving (data/wire.py: u8 images + f16 gt, ~3.6x fewer
bytes than the f32 pipeline's images+gt)."""

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
    ap.add_argument("--stream", choices=("device", "host"), default="device",
                    help="device: re-dispatch one pre-staged device batch; "
                         "host: device_put a fresh host batch every step")
    ap.add_argument("--wire", choices=("f32", "compact"), default="f32",
                    help="host-stream batch wire format (data/wire.py)")
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
    shape = (args.batch, args.height, args.width, 3 * opt.frames)

    if args.stream == "device":
        batch = {"images": jnp.asarray(rng.randn(*shape).astype(np.float32))}

        def next_batch():
            return batch
    else:
        # host streaming: pre-generate a few distinct host batches in the
        # wire format the loader would emit ([0,1] images quantized to u8
        # for compact; host-normalized-scale floats for f32), rotate
        # through them with a fresh device_put per step — the real
        # train-loop condition where H2D bandwidth is on the clock.
        from back2future_tpu.data.wire import encode_batch
        host = []
        for _ in range(4):
            imgs = rng.rand(*shape).astype(np.float32)
            b = {"images": imgs if args.wire == "f32"
                 else encode_batch({"images": imgs}, "compact")["images"]}
            host.append(b)
        nbytes = sum(v.nbytes for v in host[0].values())
        print(f"host-stream batch: {nbytes / 1e6:.1f} MB/step "
              f"({args.wire} wire)")
        counter = [0]

        def next_batch():
            counter[0] += 1
            b = host[counter[0] % len(host)]
            return {k: jax.device_put(v) for k, v in b.items()}

    state, logs = step(state, next_batch())
    np.asarray(logs["loss"])

    def window(n):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, logs = step(state, next_batch())
        np.asarray(logs["loss"])
        return (time.perf_counter() - t0) / n * 1000

    window(5)  # warm-up
    best = min(window(n) for n in (15, 10, 10))
    print(f"train step ({args.batch},{args.height},{args.width}, "
          f"stream={args.stream}): {best:.1f} ms/step wall = "
          f"{args.batch / best * 1000:.1f} triplets/s trained")


if __name__ == "__main__":
    main()
