"""Stem microbenchmark: fused Pallas stem kernels vs XLA's conv chain.

Times the levels-2+3 feature stem (3->16->16 s2, 16->32->32 s2;
models/pwc.lua:58-65) in isolation at the shapes the B=16 inference
forward and the B=8 train step actually issue.  Timing per CLAUDE.md:
queue iters, fetch the last array (the relay makes block_until_ready a
no-op); sub-ms kernels are chained in-graph.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from back2future_tpu.ops.stem_pallas import fused_stem, _stem_xla

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--inner", type=int, default=10)
    args = ap.parse_args()

    rng = np.random.default_rng(0)

    def params(ci, co):
        return {"conv": {
            "kernel": jnp.asarray(
                rng.normal(size=(3, 3, ci, co)).astype(np.float32) * 0.2),
            "bias": jnp.asarray(
                rng.normal(size=(co,)).astype(np.float32) * 0.1)}}

    p2 = {"c0": params(3, 16), "c1": params(16, 16)}
    p3 = {"c0": params(16, 32), "c1": params(32, 32)}

    def chain(fn):
        def run(x):
            def body(c, _):
                f2, f3 = fn(c, p2, p3, jnp.bfloat16)
                # fold f3 back to keep the chain data-dependent
                d = jnp.mean(f3.astype(jnp.float32)) * 1e-6
                return c + d.astype(c.dtype), None
            c, _ = jax.lax.scan(body, x, None, length=args.inner)
            return c
        return jax.jit(run)

    def timed(fn, x):
        out = fn(x)
        np.asarray(out)                     # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.iters - 1):
            out = fn(x)
        out = fn(x)
        np.asarray(out)
        return (time.perf_counter() - t0) / (args.iters * args.inner) * 1e3

    shapes = [(48, 320, 1216), (24, 320, 640)]
    print(f"{'shape':>18} {'pallas ms':>10} {'xla ms':>8} {'speedup':>8}")
    for b, h, w in shapes:
        x = jnp.asarray(rng.normal(size=(b, h, w, 3)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        tp = timed(chain(fused_stem), x)
        tx = timed(chain(_stem_xla), x)
        print(f"{b}x{h}x{w:>6} {tp:10.3f} {tx:8.3f} {tx / tp:8.2f}x")


if __name__ == "__main__":
    main()
