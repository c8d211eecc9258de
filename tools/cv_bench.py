"""Per-level cost-volume microbenchmark: Pallas kernel vs XLA unroll.

Measures forward and forward+backward device-queued wall time for the
single-frame cost volume (win=9, dilation=1) at every pyramid-level
shape of the 320x640 training crop, batch 8 — the shapes the train step
actually issues (models/pwc.py:243-249). Used to pick the Pallas/XLA
crossover: small levels are kernel-launch/DMA-latency bound, where the
fused kernel loses to XLA's fusions.

Timing per CLAUDE.md: queue n iters, fetch the last array (the relay
makes block_until_ready a no-op).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timed(fn, args, iters=30):
    import jax

    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters - 1):
        fn(*args)
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def main() -> None:
    import jax
    import jax.numpy as jnp

    from back2future_tpu.ops.cost_volume import cost_volume

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--win", type=int, default=9)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    b, win = args.batch, args.win
    n_inner = 50  # chained in-graph iterations per dispatch: the relay's
    #               per-dispatch overhead (ms-scale, window-dependent)
    #               would otherwise swamp these sub-ms kernels
    shapes = [(80, 160, 32), (40, 80, 64), (20, 40, 96),
              (10, 20, 128), (5, 10, 192)]
    rng = np.random.default_rng(0)
    print(f"B={b} win={win} bf16 — ms per call "
          f"({n_inner} scan-chained calls/dispatch, {args.iters} dispatches)")
    print(f"{'shape':>16} {'fwd:pallas':>11} {'fwd:xla':>9} "
          f"{'f+b:pallas':>11} {'f+b:xla':>9}")
    for h, w, c in shapes:
        ref = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.bfloat16)
        frm = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.bfloat16)

        def make(use_pallas):
            def cv(r, f):
                return cost_volume(r, f, win, 1, True, unroll=True,
                                   use_pallas=use_pallas)

            @jax.jit
            def fwd(r, f):
                # carry-dependent frame defeats CSE/hoisting of the CV
                def body(f, _):
                    out = cv(r, f)
                    return f + 1e-6 * out[..., :1].astype(f.dtype), None

                f, _ = jax.lax.scan(body, f, None, length=n_inner)
                return f

            def loss(r, f):
                return jnp.sum(cv(r, f).astype(jnp.float32) ** 2)

            g = jax.grad(loss, argnums=(0, 1))

            @jax.jit
            def fb(r, f):
                def body(f, _):
                    dr, df = g(r, f)
                    return f + 1e-6 * df, None

                f, _ = jax.lax.scan(body, f, None, length=n_inner)
                return f

            return fwd, fb

        fwd_p, fb_p = make(True)
        fwd_x, fb_x = make(False)
        r = {}
        for name, fn in (("fp", fwd_p), ("fx", fwd_x),
                         ("bp", fb_p), ("bx", fb_x)):
            r[name] = timed(fn, (ref, frm), args.iters) * 1e3 / n_inner
        print(f"{(h, w, c)!s:>16} {r['fp']:>11.3f} {r['fx']:>9.3f} "
              f"{r['bp']:>11.3f} {r['bx']:>9.3f}")


if __name__ == "__main__":
    main()
