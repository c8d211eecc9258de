#!/usr/bin/env python
"""Single-triplet serving latency: ms per B=1 `compute_flow` call.

The reference's serving shape is one triplet per `computeFlow` call
(back2future.lua:47-95); the published throughput numbers (bench.py)
are batched. This measures what a serving user actually waits for — the
full `FlowEstimator.__call__` wall time including host preprocessing
(normalize + /64 snap), dispatch, device forward, device->host result
fetch, and host postprocessing (flow upscale + occ threshold) — and
breaks it into those components so relay-environment costs (ms-class
dispatch, ~23 MB/s D2H) are separable from what a real TPU host would
see. Also times the AOT `ExportedFlowEstimator` path (--export).

Per-call latency is measured unqueued (each call is a barrier): this is
the latency number, complementary to bench.py's queued throughput.

    python tools/serve_bench.py [--iters 20] [--export] [--cpu]

Prints one JSON line per (resolution, path) with median component ms.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# (name, raw H, raw W) — the two reference eval resolutions
# (opts.lua:125-130 Kitti/Sintel defaults); /64-snapped inside the API
RESOLUTIONS = [("kitti", 375, 1242), ("sintel", 436, 1024)]


def _median_ms(fn, iters: int) -> float:
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--export", action="store_true",
                    help="also time the AOT ExportedFlowEstimator path")
    ap.add_argument("--checkpoint", default="",
                    help="serve this checkpoint (default: random init)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    from back2future_tpu.utils import enable_compile_cache

    enable_compile_cache()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from back2future_tpu.api import (FlowEstimator, _postprocess_results,
                                     _preprocess_triplets)

    if args.checkpoint:
        from back2future_tpu.models.factory import model_for_config
        from back2future_tpu.train.checkpoint import load_model_checkpoint

        params, cfg = load_model_checkpoint(args.checkpoint)
    else:
        from back2future_tpu.config import Options
        from back2future_tpu.models.pwc import (PWCNet,
                                                pwc_config_from_options)

        opt = Options(compute_dtype="bfloat16").derive()
        cfg = pwc_config_from_options(opt)
        model = PWCNet(cfg)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 64, 128, 3 * cfg.frames), jnp.float32))["params"]

    est = FlowEstimator(params, cfg)

    rng = np.random.RandomState(0)
    results = []
    for name, h, w in RESOLUTIONS:
        ims = [rng.rand(h, w, 3).astype(np.float32)
               for _ in range(cfg.frames)]
        # first-call latency = compile (or persistent-cache hit) time;
        # compare a B2F_COMPILE_CACHE=0 run vs a cache-warm one to
        # separate remote-compile cost from cache-deserialize cost
        t0 = time.perf_counter()
        est.warmup([(h, w)])  # compile outside the per-call timed region
        warmup_s = time.perf_counter() - t0
        est(*ims)             # one full warm call (host caches, allocs)

        total = _median_ms(lambda: est(*ims), args.iters)
        pre = _median_ms(
            lambda: _preprocess_triplets([im[None] for im in ims],
                                         cfg.frames), args.iters)
        # dispatch + device, no result transfer: barrier on a 1-float
        # digest (through the relay block_until_ready is not a barrier —
        # only a D2H fetch is; see CLAUDE.md)
        imgs, n, _, _ = _preprocess_triplets([im[None] for im in ims],
                                             cfg.frames)
        x = jnp.asarray(imgs)
        digest = jax.jit(lambda f, o: f.sum()[None].astype(jnp.float32))

        def fwd():
            f, o = est._jit(est.params, x)
            np.asarray(digest(f, o))

        fwd()
        fwd_ms = _median_ms(fwd, args.iters)
        # full result transfer (flow + occ), isolated
        f_d, o_d = est._jit(est.params, x)
        np.asarray(digest(f_d, o_d))
        fetch = _median_ms(lambda: (np.asarray(f_d), np.asarray(o_d)),
                           args.iters)
        f_h, o_h = np.asarray(f_d), np.asarray(o_d)
        post = _median_ms(
            lambda: _postprocess_results(f_h, o_h, n, h, w), args.iters)
        rec = {"path": "jit", "resolution": name, "raw_hw": [h, w],
               "warmup_s": round(warmup_s, 2),
               "total_ms": round(total, 2), "pre_ms": round(pre, 2),
               "forward_ms": round(fwd_ms, 2), "fetch_ms": round(fetch, 2),
               "post_ms": round(post, 2), "iters": args.iters,
               "backend": jax.default_backend()}
        print(json.dumps(rec), flush=True)
        results.append(rec)

        if args.export:
            import tempfile

            with tempfile.TemporaryDirectory() as td:
                path = Path(td) / f"flow_{name}.b2f"
                est.export(path, [(h, w)])
                from back2future_tpu.api import load_exported

                t0 = time.perf_counter()
                ex = load_exported(path)
                ex(*ims)  # first call loads the precompiled executable
                ex_warm_s = time.perf_counter() - t0
                ex_total = _median_ms(lambda: ex(*ims), args.iters)
            rec = {"path": "exported", "resolution": name,
                   "raw_hw": [h, w], "warmup_s": round(ex_warm_s, 2),
                   "total_ms": round(ex_total, 2),
                   "iters": args.iters, "backend": jax.default_backend()}
            print(json.dumps(rec), flush=True)
            results.append(rec)

    return results


if __name__ == "__main__":
    main()
