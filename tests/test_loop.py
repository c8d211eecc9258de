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
