"""CPU-hermetic sequencing test for tools/learn_demo.py.

Exercises the full staged learning-demo driver (escape -> hard -> soft ->
eval -> report) on a tiny generated RoamingImages pair, the way
tests/test_loop.py::test_three_stage_hard_to_soft_recipe covers the raw
CLI recipe.  The point is to catch driver-script typos BEFORE a
multi-hour hardware run, so all subprocesses are pinned to CPU via the
`--platform cpu` main.py flag / eval.py `--cpu`.
"""

import json
import sys
from pathlib import Path

import pytest

TOOLS = Path(__file__).resolve().parent.parent / "tools"
sys.path.insert(0, str(TOOLS))

TINY_TRAIN = ("--platform cpu --levels 4 --frames 3 --compute_dtype float32 "
              "--cropWidth 64 --cropHeight 32 --rand_crop 0")
TINY_EVAL = "--cpu --cropWidth 64 --cropHeight 32 --batchSize 2"


@pytest.fixture(scope="module")
def tiny_sets(tmp_path_factory):
    from make_roaming import main as make_roaming

    root = tmp_path_factory.mktemp("learn_demo")
    # disjoint seeds: scenes are keyed rng((seed, i))
    make_roaming(["--out", str(root / "main"), "--n", "6", "--seed", "0",
                  "--height", "64", "--width", "96", "--frames", "3",
                  "--val_fraction", "0.34"])
    make_roaming(["--out", str(root / "esc"), "--n", "2", "--seed", "1",
                  "--height", "64", "--width", "96", "--frames", "3"])
    return root


def _args(root, out, cache, stage="all"):
    return ["--data", str(root / "main"),
            "--escape_data", str(root / "esc"),
            "--out", str(out), "--cache", str(cache),
            "--stage", stage, "--escape_epochs", "1",
            "--epochs1", "1", "--epochs2", "1",
            "--epoch_size", "2", "--batch", "2", "--wire", "f32",
            "--train_args", TINY_TRAIN, "--eval_args", TINY_EVAL]


def test_full_stage_sequencing_writes_report(tiny_sets, tmp_path):
    from learn_demo import main as learn_demo

    out = tmp_path / "evidence"
    learn_demo(_args(tiny_sets, out, tmp_path / "ckpt"))

    report = json.loads((out / "learning_demo.json").read_text())
    assert report["baseline"]["zero_flow_epe"] > 0
    assert report["baseline"]["n_val"] >= 1
    for k in ("eval_hard", "eval_soft"):
        assert "error" not in report[k], report[k]
        assert report[k]["epe"] > 0 and report[k]["n_samples"] >= 1
        assert 0.0 <= report[k]["occ_acc"] <= 1.0
    sanity = report["past_flow_sanity"]
    assert "error" not in sanity, sanity
    assert sanity["mean_|past-future|_over_mean_|future|"] >= 0
    # stage logs copied next to the report (the tiny escape set has no
    # val scenes, so no escape_test.tsv)
    for exp in ("escape", "hard", "soft"):
        assert (out / f"{exp}_train.tsv").exists()
    for exp in ("hard", "soft"):
        assert (out / f"{exp}_test.tsv").exists()


def test_stage_hard_without_escape_ckpt_exits_clearly(tiny_sets, tmp_path):
    from learn_demo import main as learn_demo

    with pytest.raises(SystemExit) as e:
        learn_demo(_args(tiny_sets, tmp_path / "o", tmp_path / "fresh",
                         stage="hard"))
    assert "--stage escape" in str(e.value)


def test_stage_escape_standalone_completes_without_report(tiny_sets,
                                                          tmp_path):
    from learn_demo import main as learn_demo

    out = tmp_path / "o"
    learn_demo(_args(tiny_sets, out, tmp_path / "esc_only", stage="escape"))
    assert not (out / "learning_demo.json").exists()


def test_missing_main_dataset_exits_clearly(tmp_path):
    from learn_demo import main as learn_demo

    with pytest.raises(SystemExit) as e:
        learn_demo(["--data", str(tmp_path / "nope"),
                    "--out", str(tmp_path / "o")])
    assert "make_roaming" in str(e.value)
