"""High-level epoch loop: the main.lua / train.lua / test.lua driver.

`run(opt)` wires everything: model build-or-load (model.lua:38-142),
criterions, datasets + prefetch loaders (data.lua), the per-epoch
train/validate cycle (main.lua:35-39), per-batch console lines and TSV
epoch logs (train.lua:510-518, :162-173), and checkpointing each
`epochStore` epochs (train.lua:179-185).

Data parallelism: batches are sharded over the mesh's `data` axis with
replicated params; XLA inserts the gradient all-reduce over ICI
(parallel/mesh.py).
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from ..config import Options
from ..data import (FlowDataset, PrefetchLoader, SampleConfig, device_prefetch,
                    load_manifest_cached, load_split)
from ..losses import build_criterions
from ..models.factory import model_and_config
from ..parallel.mesh import make_mesh, replicate
from ..utils import SymbolLogger, StepTimer
from .checkpoint import (load_or_convert, load_train_checkpoint,
                         save_checkpoint, wait_for_saves)
from .optim import lr_for_epoch
from .state import TrainState, create_train_state
from .step import make_eval_step, make_train_step


def build_model(opt: Options):
    return model_and_config(opt)[0]


def build_loaders(opt: Options, shard=(0, 1)):
    """Manifest + split -> train/val datasets and loaders (donkey.lua).

    `shard=(host, n_hosts)`: each host loads only its slice of every
    global batch (multi-host DCN runs); `opt.batchSize` stays the GLOBAL
    batch size. Single-host validation covers the whole split including
    the final partial batch (improving on test.lua:52-64 which drops the
    remainder); multi-host validation keeps full global batches only —
    eval_epoch logs how many samples that skips."""
    manifest = Path(opt.datasets_dir) / f"{opt.dataset}.dat"
    split = Path(opt.datasets_dir) / f"{opt.dataset}_split.dat"
    specs = load_manifest_cached(manifest, opt.ground_truth,
                                 root=opt.data_root or None,
                                 cache_dir=opt.cache)
    if split.exists():
        train_idx, val_idx = load_split(split)
    else:
        train_idx, val_idx = np.arange(len(specs)), np.arange(0)

    cfg = SampleConfig.from_options(opt)
    train_ds = FlowDataset(specs, cfg, train_idx, train=True)
    val_ds = (FlowDataset(specs, cfg, val_idx, train=False)
              if len(val_idx) else None)

    train_loader = PrefetchLoader(
        train_ds, opt.batchSize, n_batches=opt.epochSize,
        n_workers=opt.nDonkeys, manual_seed=opt.manualSeed, shard=shard,
        scene_batches=opt.scene_batches)
    if val_ds is None:
        n_val_batches = 0
    elif shard[1] == 1:
        n_val_batches = -(-len(val_ds) // opt.batchSize)  # ceil
        remainder = len(val_ds) % opt.batchSize
        if remainder and shard[0] == 0:
            # surface the one-time cost of full-split coverage: the
            # partial final batch is a second jit specialization of the
            # full-model eval step (one extra compile, amortized by the
            # persistent compile cache) and runs replicated on the mesh
            print(f"validation: final partial batch of {remainder} "
                  f"samples adds one extra eval-step compile "
                  f"(full-split coverage; cached across runs)")
    else:
        n_val_batches = len(val_ds) // opt.batchSize
    val_loader = (PrefetchLoader(val_ds, opt.batchSize, n_val_batches,
                                 n_workers=opt.nDonkeys,
                                 manual_seed=opt.manualSeed, sequential=True,
                                 shard=shard)
                  if n_val_batches else None)
    return train_loader, val_loader


def _fmt_console(epoch, i, n, batch_time: float, data_time: float,
                 logs: Dict, lr: float) -> str:
    """Per-batch console line (train.lua:505-518). `batch_time` is the
    total wall time attributed to this batch (the reference's Time field
    also includes data wait, train.lua:498-517); `data_time` is the host
    wait for THIS batch's data, snapshotted at dispatch."""
    parts = [f"Epoch: [{epoch}][{i}/{n}]",
             f"Time {batch_time:.3f}",
             f"ERR {float(logs.get('loss', 0)):.3f}"]
    for key, label in (("pme", "PME"), ("sflow", "SmoothFlow"),
                       ("socc", "SmoothOcc"), ("gocc", "PriorOcc"),
                       ("epe", "EPE"), ("epe_nocc", "EPE non Occ"),
                       ("epe_occ", "EPE Occ")):
        if key in logs:
            parts.append(f"{label} {float(logs[key]):.3f}")
    if "occ_acc" in logs:
        parts.append(
            f"Occ Acc {float(logs['occ_acc']):.3f} "
            f"({float(logs['occ_acc_bwd']):.3f},"
            f"{float(logs['occ_acc_vis']):.3f},"
            f"{float(logs['occ_acc_fwd']):.3f})")
    parts.append(f"LR {lr:.0e}")
    parts.append(f"DataLoadingTime {data_time:.3f}")
    return "\t".join(parts)


def _debug_dump(save: str, epoch: int, i: int, model, params, batch,
                frames: int) -> None:
    """-debug 1: dump the reference frame and the finest-level warped
    frames as PNGs (train.lua:254-277 writes them to tmp/)."""
    import jax

    from ..data.augment import IMAGENET_MEAN, IMAGENET_STD
    from ..data.wire import decode_batch
    from ..io.png16 import write_png

    out_dir = Path(save) / "tmp"
    out_dir.mkdir(parents=True, exist_ok=True)
    fwd = _debug_dump.__dict__.setdefault(
        id(model), jax.jit(lambda p, b: model.apply(
            {"params": p}, decode_batch(b)["images"])))
    outputs = fwd(params, batch)
    g0 = outputs[0]
    rc = (0 if frames == 2 else (frames - 1) // 2) * 3

    def unnorm(img):
        x = np.asarray(img, np.float32) * IMAGENET_STD + IMAGENET_MEAN
        return (np.clip(x, 0, 1) * 255).astype(np.uint8)

    ref_img = np.asarray(batch["images"][0][..., rc:rc + 3])
    write_png(out_dir / f"e{epoch}_b{i}_ref.png",
              ref_img if ref_img.dtype == np.uint8  # compact wire: raw u8
              else unnorm(ref_img))
    for k, wimg in enumerate(g0["warped"]):
        write_png(out_dir / f"e{epoch}_b{i}_warp{k}.png",
                  unnorm(np.asarray(wimg[0], np.float32)))


def _epoch_means(rows) -> Dict[str, float]:
    keys = rows[0].keys()
    return {k: float(np.mean([float(r[k]) for r in rows if k in r]))
            for k in keys}


def train_epoch(epoch: int, state: TrainState, step, loader, mesh, opt,
                logger: SymbolLogger, verbose: bool = True, model=None):
    """One training epoch (train.lua:108-186)."""
    import jax

    state = state.with_epoch(epoch, opt)
    # pin the sample stream to the global epoch (1-based loop -> 0-based
    # stream) so resumed runs draw epoch N's data, not epoch 1's again
    loader.set_epoch(epoch - 1)
    lr = lr_for_epoch(epoch, opt.LR)
    rows = []
    timer = StepTimer()
    t0 = time.time()

    last_drain = [t0]

    def drain(pending):
        """Fetch a queued step's logs (ONE host transfer) and print its
        console line. Deferring this behind a window of in-flight steps
        overlaps the device's later steps with the host-side fetch of
        step i — a per-step sync would serialize device and host
        (train.lua syncs every batch; the relay makes that expensive:
        its D2H round trip is ~10x a train step's device time, so a
        1-deep window still pays one full round trip per step; the
        copy_to_host_async at enqueue lets round trips overlap each
        other across the window). Each batch's data-loading time is
        snapshotted at dispatch so the deferred line reports the right
        batch's wait."""
        i, logs, data_time = pending
        logs = {k: float(v) for k, v in zip(logs, jax.device_get(
            list(logs.values())))}
        now = time.time()
        batch_time, last_drain[0] = now - last_drain[0], now
        # the device_get above blocked on the device; reset the timer
        # mark so the NEXT batch's data_loaded() measures only its own
        # host wait, not this drain
        timer.step_done()
        rows.append(logs)
        if verbose:
            print(_fmt_console(epoch, i + 1, len(loader), batch_time,
                               data_time, logs, lr))

    from collections import deque

    # Window depth: enough round trips in flight to amortize relay
    # latency over device-bound steps. Logs are a handful of scalars, so
    # the extra resident buffers are negligible (the input batches ahead
    # of the device are bounded separately by device_prefetch's depth).
    drain_depth = max(2, opt.prefetch_depth, 16)
    pending_q = deque()
    spatial = "spatial" in mesh.axis_names
    for i, batch in enumerate(
            device_prefetch(iter(loader), mesh, spatial=spatial,
                            depth=opt.prefetch_depth)):
        timer.data_loaded()
        state, logs = step(state, batch)
        for v in logs.values():  # start the D2H transfer now
            if hasattr(v, "copy_to_host_async"):
                v.copy_to_host_async()
        pending_q.append((i, logs, timer.data_time))
        if len(pending_q) > drain_depth:
            drain(pending_q.popleft())
        if opt.debug == 1 and model is not None:
            _debug_dump(opt.save, epoch, i, model, state.params, batch,
                        opt.frames)
    while pending_q:
        drain(pending_q.popleft())

    means = _epoch_means(rows)
    summary = {"avg loss (train set)": means["loss"]}
    if "epe" in means:
        summary.update({
            "avg epe (train set)": means["epe"],
            "avg epe non occ (train set)": means["epe_nocc"],
            "avg epe occ (train set)": means["epe_occ"]})
    if "occ_acc" in means:
        summary.update({
            "avg occ acc (train set)": means["occ_acc"],
            "avg bwd acc (train set)": means["occ_acc_bwd"],
            "avg vis acc (train set)": means["occ_acc_vis"],
            "avg fwd acc (train set)": means["occ_acc_fwd"]})
    logger.add(summary)
    if verbose:
        print(f"Epoch: [{epoch}][TRAINING SUMMARY] Total Time(s): "
              f"{time.time() - t0:.2f}\taverage loss (per batch): "
              f"{means['loss']:.4f}")
    return state, means


def eval_epoch(epoch: int, state: TrainState, eval_step, loader, mesh, opt,
               logger: SymbolLogger, verbose: bool = True):
    """Validation epoch (test.lua:33-95)."""
    import jax

    from collections import deque

    handles = deque()
    loader.set_epoch(epoch - 1)
    rows, weights = [], []
    t0 = time.time()

    def fetch(item):
        h, w = item
        rows.append({k: float(v) for k, v in
                     zip(h, jax.device_get(list(h.values())))})
        weights.append(w)

    # Keep a bounded number of eval steps in flight: dispatch returns
    # immediately, so an unbounded queue would pin every validation
    # batch's input buffers in HBM at once. Fetching the oldest handle's
    # scalars is a completion barrier for that step (in-order execution),
    # which caps resident batches at the window size while still
    # overlapping host loading with device compute.
    max_in_flight = max(2, opt.prefetch_depth)
    spatial = "spatial" in mesh.axis_names
    for batch in device_prefetch(iter(loader), mesh, spatial=spatial,
                                 depth=opt.prefetch_depth,
                                 allow_partial=True):
        # the final batch may be partial (single-host ceil coverage);
        # per-batch sample counts weight the aggregation so the epoch
        # metrics are exact over everything evaluated
        handles.append((eval_step(state.params, batch),
                        int(batch["images"].shape[0])))
        if len(handles) > max_in_flight:
            fetch(handles.popleft())
    while handles:
        fetch(handles.popleft())
    w = np.asarray(weights, np.float64)
    means = {k: float(np.average([float(r[k]) for r in rows], weights=w))
             for k in rows[0]}
    n_eval, n_total = int(w.sum()), len(loader.dataset)
    summary = {"avg loss (test set)": means["loss"]}
    if "epe" in means:
        summary["avg epe (test set)"] = means["epe"]
    if "occ_acc" in means:
        summary["avg occ acc (test set)"] = means["occ_acc"]
    logger.add(summary)
    if verbose:
        skipped = (f" ({n_total - n_eval} skipped)" if n_eval < n_total
                   else "")
        print(f"Epoch: [{epoch}][TESTING SUMMARY] Total Time(s): "
              f"{time.time() - t0:.2f}\taverage loss (per batch): "
              f"{means['loss']:.4f}\tsamples {n_eval}/{n_total}{skipped}")
    return means


def _state_fingerprint(params, epoch0: int) -> str:
    """Order-stable digest of (start epoch, param tree) for cross-host
    resume-consistency checks."""
    import hashlib

    import jax

    h = hashlib.md5(str(epoch0).encode())
    leaves = jax.tree_util.tree_leaves_with_path(params)
    for path, leaf in sorted(leaves, key=lambda kv: str(kv[0])):
        arr = np.asarray(leaf)
        h.update(str(path).encode())
        h.update(str(arr.shape).encode())
        h.update(np.ascontiguousarray(arr).tobytes())
    return h.hexdigest()


def run(opt: Options, max_epochs: Optional[int] = None) -> TrainState:
    """Full training run (main.lua:17-39). Returns the final state.

    Multi-host: `initialize_multihost` wires the DCN cluster FIRST (it
    must precede any backend touch); every host then runs this same
    function, loading only its slice of each global batch
    (build_loaders shard) while the mesh spans all hosts' chips. With
    more than one host, nGPU (a single-machine knob, util.lua:27-48) is
    ignored and the mesh uses every chip in the slice."""
    import jax

    from ..parallel.distributed import (host_local_batch_size,
                                        initialize_multihost)

    initialize_multihost()
    np.random.seed(opt.manualSeed)

    n_hosts = jax.process_count()
    shard = (jax.process_index(), n_hosts)
    host_local_batch_size(opt.batchSize)  # validates divisibility
    # opt.GPU is the 1-based first device (main.lua's cutorch.setDevice
    # analog); opt.nGPU devices starting there form the single-host mesh
    base = max(opt.GPU - 1, 0)
    if opt.nGPU > 0 and base + opt.nGPU > len(jax.devices()):
        raise ValueError(
            f"-GPU {opt.GPU} -nGPU {opt.nGPU} asks for devices "
            f"{base + 1}..{base + opt.nGPU} but this host has only "
            f"{len(jax.devices())} (cutorch.setDevice would error too)")
    local_devices = (jax.devices()[base:base + opt.nGPU]
                     if opt.nGPU > 0 else None)
    mesh = make_mesh(None if n_hosts > 1 else local_devices,
                     shape=opt.mesh_shape, axes=opt.mesh_axes)
    model = build_model(opt)
    crits = build_criterions(opt)
    state = None
    if opt.cont and not opt.adam_reset_per_epoch:
        # With persistent Adam moments, a resume must restore them from
        # optimState_<e> (model.lua:51-130); with the reference's
        # per-epoch reset they would be discarded at with_epoch anyway.
        try:
            state, epoch0 = load_train_checkpoint(opt.save, opt)
        except FileNotFoundError:
            state = None
    if state is None:
        params, _cfg, epoch0 = load_or_convert(opt)
        state = create_train_state(params, opt, epoch=epoch0)
    if n_hosts > 1:
        # replicate()'s multi-host path assembles the "replicated" params
        # from per-host copies and REQUIRES them identical; catch silent
        # divergence (e.g. a -cont resume where only host 0 sees the
        # checkpoint because opt.save isn't shared storage) before it
        # corrupts the run
        from ..parallel.distributed import assert_same_across_hosts
        assert_same_across_hosts(
            "resume_state", _state_fingerprint(state.params, epoch0))
    state = state.replace(params=replicate(state.params, mesh),
                          opt_state=replicate(state.opt_state, mesh))

    train_loader, val_loader = build_loaders(opt, shard=shard)
    step = make_train_step(model, opt, crits)
    eval_step = make_eval_step(model, opt, crits)

    # On a shared filesystem N hosts must not interleave writes into one
    # TSV; host 0 owns the canonical logs (and the console), the others
    # keep per-host side logs for debugging.
    is_main = shard[0] == 0
    suffix = "" if is_main else f".host{shard[0]}"
    train_log = SymbolLogger(Path(opt.save) / f"train.log{suffix}")
    test_log = SymbolLogger(Path(opt.save) / f"test.log{suffix}")

    last = opt.nEpochs if max_epochs is None else min(
        opt.nEpochs, epoch0 + max_epochs - 1)
    if n_hosts > 1:
        # align hosts + establish the collective context BEFORE the
        # expensively-compiled first step (see sync_hosts docstring)
        from ..parallel.distributed import sync_hosts
        sync_hosts(mesh)
    with mesh:
        for epoch in range(epoch0, last + 1):
            state, _ = train_epoch(epoch, state, step, train_loader, mesh,
                                   opt, train_log, verbose=is_main,
                                   model=model)
            if val_loader is not None:
                eval_epoch(epoch, state, eval_step, val_loader, mesh, opt,
                           test_log, verbose=is_main)
            if epoch % opt.epochStore == 0 and is_main:
                # replicated state: host 0's copy IS the checkpoint
                # (cleanDPT-style dedup, util.lua:50-78)
                save_checkpoint(opt.save, state, opt, epoch)
            for log in (train_log, test_log):  # myLogger.lua:137-192
                try:
                    log.plot()
                except (ValueError, FileNotFoundError):
                    pass  # empty log (e.g. no val split yet)
    wait_for_saves()
    return state
