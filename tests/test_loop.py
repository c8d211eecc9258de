"""End-to-end epoch-loop integration test (main.lua flow on toy data)."""

import json
from pathlib import Path

import numpy as np
import pytest

from back2future_tpu.config import Options
from back2future_tpu.data import SampleSpec, write_manifest
from back2future_tpu.io.png16 import write_png
from back2future_tpu.train.loop import run
from back2future_tpu.utils import SymbolLogger


@pytest.fixture(scope="module")
def toy_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("toyloop")
    (root / "datasets").mkdir()
    rng = np.random.default_rng(0)
    for i in range(1, 8):
        write_png(root / f"img_{i:02d}.png",
                  (rng.random((40, 72, 3)) * 255).astype(np.uint8))
    write_manifest(root / "datasets" / "toy.dat",
                   [SampleSpec("[PATH]/img_%02d.png", None, r, 1)
                    for r in (2, 3, 4, 5)])
    (root / "datasets" / "toy_split.dat").write_text("1\n1\n2\n2\n")
    return root


def test_run_two_epochs_checkpoints_and_logs(toy_tree):
    opt = Options(
        dataset="toy", datasets_dir=str(toy_tree / "datasets"),
        data_root=str(toy_tree), cache=str(toy_tree / "ckpt"),
        expName="itest", optimize="pme", frames=3, levels=4,
        compute_dtype="float32", cropHeight=32, cropWidth=64,
        batchSize=2, epochSize=2, nEpochs=2, nDonkeys=0, epochStore=1,
        nGPU=1,
    ).derive(make_dirs=True)

    state = run(opt)
    assert int(state.step) == 4  # 2 epochs x 2 batches

    save = Path(opt.save)
    for e in (1, 2):
        assert (save / f"model_{e}.msgpack").exists()
        assert (save / f"optimState_{e}.msgpack").exists()
    train_cols = SymbolLogger(save / "train.log").read()
    assert len(train_cols["avg loss (train set)"]) == 2
    test_cols = SymbolLogger(save / "test.log").read()
    assert len(test_cols["avg loss (test set)"]) == 2
    assert all(np.isfinite(v) for v in train_cols["avg loss (train set)"])

    # -cont resume picks up after the last checkpoint
    import dataclasses

    opt2 = dataclasses.replace(opt, cont=True, nEpochs=3)
    state2 = run(opt2)
    assert int(state2.step) == 2  # one more epoch, fresh step counter
    assert (save / "model_3.msgpack").exists()

    # -cont with persistent Adam moments restores the optimizer state and
    # global step from optimState_<e> (model.lua:51-130)
    opt3 = dataclasses.replace(opt, cont=True, nEpochs=4,
                               adam_reset_per_epoch=False)
    state3 = run(opt3)
    assert int(state3.step) == 4  # resumed step counter (2) + 2 batches
    assert (save / "model_4.msgpack").exists()


def test_resume_trajectory_matches_straight_run(toy_tree):
    """Checkpoint-resume exactness: 1 epoch + `-cont` for a 2nd must land
    on EXACTLY the params of an uninterrupted 2-epoch run — the joint
    guarantee of the slot-seeded loader (epoch content is a function of
    (seed, epoch), not of process history), persistent Adam moments in
    optimState_<e>, and the LR regime being a pure function of epoch.
    The reference cannot make this promise (its donkey RNG streams are
    process-continuous); the rebuild's loader was designed so it can."""
    import dataclasses

    import jax

    base = dict(
        dataset="toy", datasets_dir=str(toy_tree / "datasets"),
        data_root=str(toy_tree), cache=str(toy_tree / "ckpt"),
        optimize="pme", frames=3, levels=4,
        compute_dtype="float32", cropHeight=32, cropWidth=64,
        batchSize=2, epochSize=2, nDonkeys=0, epochStore=1,
        nGPU=1, adam_reset_per_epoch=False,
    )
    straight = run(Options(expName="straight", nEpochs=2,
                           **base).derive(make_dirs=True))

    opt_a = Options(expName="resumed", nEpochs=1, **base).derive(
        make_dirs=True)
    run(opt_a)
    resumed = run(dataclasses.replace(opt_a, cont=True, nEpochs=2))

    assert int(straight.step) == int(resumed.step) == 4
    flat_s = jax.tree_util.tree_leaves_with_path(straight.params)
    flat_r = dict(jax.tree_util.tree_leaves_with_path(resumed.params))
    for path, leaf in flat_s:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_r[path]),
            err_msg=f"resume diverged at {path}")


def test_three_stage_hard_to_soft_recipe(toy_tree):
    """The reference's flagship training recipe, end-to-end
    (README.md:83-103): hard pretrain (OBCC, single future-flow decoder)
    -> `-retrain <ckpt> -convert_to_soft 1` surgery -> soft fine-tune
    (OBGCC + past_flow + const_vel + second-order smoothness)."""
    import dataclasses

    import jax

    from back2future_tpu.train.checkpoint import load_or_convert
    from back2future_tpu.train.loop import build_model

    # --- stage 1: hard-constraint pretrain (OBCC) ---
    hard_opt = Options(
        dataset="toy", datasets_dir=str(toy_tree / "datasets"),
        data_root=str(toy_tree), cache=str(toy_tree / "ckpt3"),
        expName="hard", optimize="pme", pme_criterion="OBCC",
        frames=3, levels=4, compute_dtype="float32",
        cropHeight=32, cropWidth=64, batchSize=2, epochSize=3,
        nEpochs=1, nDonkeys=0, epochStore=1, nGPU=1, LR=1e-3,
    ).derive(make_dirs=True)
    assert not hard_opt.past_flow
    run(hard_opt)
    hard_ckpt = Path(hard_opt.save) / "model_1.msgpack"
    assert hard_ckpt.exists()

    # --- stage 2: conversion surgery (model.lua:56-116 analog) ---
    soft_opt = Options(
        dataset="toy", datasets_dir=str(toy_tree / "datasets"),
        data_root=str(toy_tree), cache=str(toy_tree / "ckpt3"),
        expName="soft", optimize="pme", pme_criterion="OBGCC",
        past_flow=True, const_vel=1.0, smooth_second_order=True,
        retrain=str(hard_ckpt), convert_to_soft=True,
        frames=3, levels=4, compute_dtype="float32",
        cropHeight=32, cropWidth=64, batchSize=2, epochSize=3,
        nEpochs=2, nDonkeys=0, epochStore=1, nGPU=1, LR=1e-3,
    ).derive(make_dirs=True)
    params, _, _ = load_or_convert(soft_opt)
    past = [k for k in params if k.startswith("past_decoder_")]
    assert past, "surgery produced no past-flow decoders"
    for k in past:  # seeded from the matching hard future-flow decoder
        src = params[k.replace("past_decoder_", "flow_decoder_")]
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(a, b), params[k], src)

    # --- stage 3: soft fine-tune from the surgered weights ---
    state = run(soft_opt)
    assert int(state.step) == 6
    cols = SymbolLogger(Path(soft_opt.save) / "train.log").read()
    losses = cols["avg loss (train set)"]
    assert len(losses) == 2 and all(np.isfinite(v) for v in losses)
    assert losses[-1] < losses[0]  # fine-tune makes progress

    # the trained soft model emits past-flow outputs at every level
    import jax.numpy as jnp
    model = build_model(soft_opt)
    outs = model.apply({"params": jax.device_get(state.params)},
                       jnp.zeros((1, 32, 64, 9), jnp.float32))
    assert all(g["flow_past"] is not None for g in outs)
    # ...and the past decoders have diverged from their future seeds
    p = jax.device_get(state.params)
    diverged = any(
        not np.array_equal(a, b)
        for k in past
        for a, b in zip(jax.tree_util.tree_leaves(p[k]),
                        jax.tree_util.tree_leaves(
                            p[k.replace("past_decoder_", "flow_decoder_")])))
    assert diverged


@pytest.fixture(scope="module")
def toy_gt_tree(tmp_path_factory):
    """Toy dataset WITH .flo ground truth + occ maps for the epe branch."""
    from back2future_tpu.io.flow_io import write_disp, write_flo

    root = tmp_path_factory.mktemp("toygt")
    (root / "datasets").mkdir()
    rng = np.random.default_rng(1)
    h, w = 40, 72
    for i in range(1, 7):
        write_png(root / f"img_{i:02d}.png",
                  (rng.random((h, w, 3)) * 255).astype(np.uint8))
    for r in (2, 3, 4):
        write_flo(root / f"flow_{r:02d}.flo",
                  rng.standard_normal((h, w, 2)).astype(np.float32))
        write_disp(root / f"flow_{r:02d}_occ_3.disp",
                   np.full((h, w), 0.5, np.float32))
    write_manifest(root / "datasets" / "toygt.dat",
                   [SampleSpec("[PATH]/img_%02d.png", "[PATH]/flow_%02d.flo",
                               r, 1) for r in (2, 3, 4)])
    (root / "datasets" / "toygt_split.dat").write_text("1\n1\n2\n")
    return root


def test_run_supervised_epe_branch(toy_gt_tree):
    """main.lua flow with -optimize epe: supervised losses + gt metrics."""
    opt = Options(
        dataset="toygt", datasets_dir=str(toy_gt_tree / "datasets"),
        data_root=str(toy_gt_tree), cache=str(toy_gt_tree / "ckpt"),
        expName="epe", optimize="epe", epe=1.0, frames=3, levels=4,
        compute_dtype="float32", cropHeight=32, cropWidth=64,
        batchSize=2, epochSize=2, nEpochs=1, nDonkeys=0, epochStore=1,
        nGPU=1,
    ).derive(make_dirs=True)
    assert opt.ground_truth  # derived (opts.lua:146-148)

    state = run(opt)
    assert int(state.step) == 2
    cols = SymbolLogger(Path(opt.save) / "train.log").read()
    # supervised epoch summary carries the gt metric columns
    assert "avg epe (train set)" in cols
    assert "avg occ acc (train set)" in cols
    assert all(np.isfinite(v) for v in cols["avg epe (train set)"])


def test_spatial_mesh_run_matches_dp(toy_tree):
    """`--mesh_shape 4,2 --mesh_axes data,spatial` must actually shard H
    through the real train loop and produce the same trajectory as pure
    DP (same global batch; only reduction order may differ)."""
    import dataclasses

    import jax

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs the 8-device CPU mesh")

    base = dict(
        dataset="toy", datasets_dir=str(toy_tree / "datasets"),
        data_root=str(toy_tree), cache=str(toy_tree / "ckptsp"),
        optimize="pme", frames=3, levels=4, compute_dtype="float32",
        cropHeight=32, cropWidth=64, batchSize=4, epochSize=2,
        nEpochs=1, nDonkeys=0, epochStore=1, LR=1e-3)
    opt_dp = Options(expName="dp", nGPU=4, **base).derive(make_dirs=True)
    opt_sp = Options(expName="sp", nGPU=8, mesh_shape=(4, 2),
                     mesh_axes=("data", "spatial"),
                     **base).derive(make_dirs=True)

    run(opt_dp)
    run(opt_sp)
    dp = SymbolLogger(Path(opt_dp.save) / "train.log").read()
    sp = SymbolLogger(Path(opt_sp.save) / "train.log").read()
    np.testing.assert_allclose(sp["avg loss (train set)"],
                               dp["avg loss (train set)"],
                               rtol=2e-3, atol=1e-5)
