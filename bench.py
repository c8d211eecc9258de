"""Headline benchmark: KITTI-2015 3-frame inference throughput per chip.

Measures the flagship forward path (multi-frame PWC, frames=3, levels=7,
bfloat16 compute) at the KITTI eval resolution 1242x375, preprocessed the
way the reference inference API does — W,H rounded down to a multiple of
64, i.e. 1216x320 (back2future.lua:54-71) — and reports triplets/sec/chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "triplets/sec/chip", "vs_baseline": N}

`vs_baseline` is relative to an estimated Torch7+CUDA-9 reference
throughput on the 2018-era GPU the reference targeted (README.md:23-33).
The reference publishes no numbers (BASELINE.json: published={}); we pin
the estimate at 10 triplets/sec (PWC-class nets ran ~60-100 ms/frame at
KITTI resolution on that stack, and this model adds a second cost volume
and an occlusion decoder per level). The driver-defined north star of
">10x Torch7-CUDA per chip" therefore corresponds to vs_baseline >= 10.
"""

from __future__ import annotations

import json
import os
import time

BASELINE_TRIPLETS_PER_SEC = 10.0  # estimated Torch7-CUDA per-GPU throughput

# KITTI 1242x375 rounded down to multiples of 64 (back2future.lua:54-71)
H, W = 320, 1216

# Last successful hardware measurement, refreshed after every clean run.
# Serves as the honest fallback when the relay is in one of its
# multi-hour outages at bench time (the result is emitted with
# "stale": true so it can never be mistaken for a fresh measurement).
LASTGOOD_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_LASTGOOD.json")


def _wait_for_backend() -> bool:
    """Pre-flight: probe the TPU relay in SUBPROCESSES until it answers.

    The relay goes down for stretches (observed: hours); a failed backend
    init is cached inside a JAX process, so the probe must run out of
    process and this process must not touch JAX until a probe succeeds.
    Bounded by B2F_BENCH_WAIT_S (default 20 min; 0 disables).
    Returns True if a probe succeeded (or probing is disabled)."""
    import subprocess
    import sys

    budget = float(os.environ.get("B2F_BENCH_WAIT_S", "1200"))
    if budget <= 0:
        return True
    probe = ("import jax, numpy as np, jax.numpy as jnp;"
             "x = jnp.ones((8, 8));"
             "print(float(np.asarray(x.sum())))")
    deadline = time.time() + budget
    attempt = 0
    while True:
        attempt += 1
        remaining = deadline - time.time()
        try:
            rc = subprocess.run(
                [sys.executable, "-c", probe],
                timeout=min(180.0, max(15.0, remaining)),
                capture_output=True).returncode
        except subprocess.TimeoutExpired:
            rc = -1
        if rc == 0:
            return True
        if time.time() >= deadline:
            print(f"bench: backend probe failed {attempt}x for "
                  f"{budget:.0f}s", file=sys.stderr, flush=True)
            return False
        print(f"bench: backend unavailable (probe {attempt}); retrying...",
              file=sys.stderr, flush=True)
        time.sleep(min(60.0, max(5.0, deadline - time.time())))


def emit_stale_lastgood(path: str = LASTGOOD_PATH) -> bool:
    """Print the last-good hardware result flagged as stale.

    Used when the TPU relay is unreachable for the whole probe budget:
    a clearly-flagged previous measurement is strictly more informative
    than a stack trace and no JSON at all. Returns False if no last-good
    record exists (caller should then fall through to the live path and
    let the real backend error surface)."""
    import sys

    try:
        with open(path) as f:
            rec = json.load(f)
    except (OSError, ValueError):
        return False
    rec["stale"] = True
    rec["stale_reason"] = (
        "TPU relay unreachable for the whole B2F_BENCH_WAIT_S probe "
        "budget at bench time; this is the most recent hardware "
        "measurement, NOT a fresh one")
    print(json.dumps(rec))
    sys.stdout.flush()
    return True


def _save_lastgood(record: dict) -> None:
    try:
        rec = dict(record)
        rec["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                           time.gmtime())
        with open(LASTGOOD_PATH, "w") as f:
            json.dump(rec, f, indent=1)
            f.write("\n")
    except OSError as e:  # never let bookkeeping kill a good run
        import sys
        print(f"bench: could not save last-good record: {e}",
              file=sys.stderr)


def main() -> None:
    if not _wait_for_backend() and emit_stale_lastgood():
        return

    import jax
    import jax.numpy as jnp
    import numpy as np

    from back2future_tpu.config import Options
    from back2future_tpu.models.pwc import PWCNet, pwc_config_from_options
    from back2future_tpu.utils import enable_compile_cache

    enable_compile_cache()
    opt = Options(compute_dtype="bfloat16").derive()
    model = PWCNet(pwc_config_from_options(opt))

    # B=16 is the measured dispatch-amortization knee on v5e (see
    # BENCHMARKS.md batch scan); B2F_BENCH_BATCH overrides for scans
    batch = int(os.environ.get("B2F_BENCH_BATCH", "16"))
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, H, W, 9).astype(np.float32))

    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 128, 9), jnp.float32))["params"]

    @jax.jit
    def forward(params, x):
        outs = model.apply({"params": params}, x)
        g = outs[0]
        return g["flow"], g["occ"]

    # compile + warm-up. NOTE: through the remote-relay PJRT backend,
    # block_until_ready returns immediately on in-flight futures; only a
    # device->host transfer actually waits for execution. Timing therefore
    # queues n_iters forwards and forces completion with ONE final fetch
    # (executions are in-order on the device stream, so the last result
    # being host-visible implies all prior iterations completed).
    #
    # The completion fetch is a 16-float digest jitted FROM the final
    # outputs (data dependency -> executes after the last forward), not
    # the outputs themselves: fetching the full B=16 flow+occ (~100 MB)
    # through the ~100 MB/s relay costs ~1 s per window — relay D2H
    # bandwidth, not chip work — and was exactly the r1/r2 gap between
    # wall (215/s) and device-limited (~398/s) throughput. The relay
    # fetch cost is measured separately and reported as its own field.
    @jax.jit
    def digest(flow, occ):
        return flow.ravel()[:8] + occ.ravel()[:8]

    flow, occ = forward(params, x)
    np.asarray(digest(flow, occ))

    def timed_round(n_iters: int) -> float:
        t0 = time.perf_counter()
        for _ in range(n_iters - 1):
            forward(params, x)
        f, o = forward(params, x)
        np.asarray(digest(f, o))
        return batch * n_iters / (time.perf_counter() - t0)

    # one-off measurement of the relay's device->host path for a full
    # result fetch (flow only), for the JSON side-channel field
    t0 = time.perf_counter()
    full = np.asarray(forward(params, x)[0])
    result_fetch_s = time.perf_counter() - t0
    fetch_mb = full.nbytes / 1e6

    # Relay throughput fluctuates 20-40% between timing windows (queue
    # scheduling outside this process's control); measure several windows
    # and report the MEDIAN as the robust headline estimator (best-of is
    # kept as a secondary field — it shows what a clean window sustains;
    # device time per forward is stable, the variance is all relay-side).
    timed_round(10)  # warm-up round, discarded
    windows = sorted(timed_round(n) for n in (30, 20, 20, 20, 30, 20, 20))
    triplets_per_sec = windows[len(windows) // 2]
    record = {
        "metric": "kitti2015_3frame_inference_throughput_1242x375",
        "value": round(triplets_per_sec, 3),
        "unit": "triplets/sec/chip",
        "vs_baseline": round(triplets_per_sec / BASELINE_TRIPLETS_PER_SEC, 3),
        "best_window": round(windows[-1], 3),
        "windows": [round(w, 3) for w in windows],
        "result_fetch_ms": round(result_fetch_s * 1e3, 1),
        "result_fetch_mb": round(fetch_mb, 1),
    }
    print(json.dumps(record))
    _save_lastgood(record)


if __name__ == "__main__":
    main()
