"""Three-stage training-recipe smoke on real hardware, via the CLI.

The reference's flagship workflow (README.md:83-103):

  1. hard-constraint pretrain: OBCC photometric, single future-flow
     decoder, past frames warped by the negated future flow;
  2. `-retrain <ckpt> -convert_to_soft 1`: load the hard checkpoint into
     a past_flow graph via the named-decoder surgery
     (models/surgery.py; reference model.lua:56-116);
  3. soft fine-tune: OBGCC + -past_flow 1 -const_vel 1
     -smooth_second_order 1.

This drives both stages through `main.py` on whatever backend JAX
resolves (the real TPU under the default env) over a synthetic
KITTI-sized dataset, then asserts the soft run trained from the
surgered weights (finite losses, past-flow decoders present in the
stage-3 checkpoint). The CPU-hermetic equivalent lives in
tests/test_loop.py::test_three_stage_hard_to_soft_recipe; this is the
hardware evidence run.

Usage: python tools/recipe_smoke.py [--epoch_size 8] [--keep DIR]
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    from loader_bench import make_dataset

    ap = argparse.ArgumentParser()
    ap.add_argument("--epoch_size", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--workers", type=int, default=0)
    ap.add_argument("--keep", default="", help="copy the save dirs here")
    args = ap.parse_args()

    repo = Path(__file__).resolve().parent.parent
    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        man = make_dataset(root / "data", n_seqs=16)
        ds_dir = root / "datasets"
        ds_dir.mkdir()
        (ds_dir / "Smoke.dat").write_text(man.read_text())
        (ds_dir / "Smoke_split.dat").write_text(
            "".join("2\n" if i % 4 == 0 else "1\n" for i in range(16)))

        common = ["--dataset", "Smoke", "--datasets_dir", str(ds_dir),
                  "--cache", str(root / "run"),
                  "--cropWidth", "640", "--cropHeight", "320",
                  "--batchSize", str(args.batch),
                  "--nDonkeys", str(args.workers),
                  "--epochSize", str(args.epoch_size),
                  "--epochStore", "1",
                  "--smooth_flow", "0.1", "--smooth_occ", "0.1",
                  "--prior_occ", "0.1"]

        def cli(stage_args, label):
            cmd = [sys.executable, str(repo / "main.py")] + common + stage_args
            print(f"\n=== {label} ===\n+ {' '.join(cmd[1:])}", flush=True)
            t0 = time.time()
            rc = subprocess.run(cmd, cwd=repo).returncode
            print(f"[{label}] wall {time.time() - t0:.1f}s rc={rc}",
                  flush=True)
            if rc != 0:
                sys.exit(rc)

        # --- stage 1: hard pretrain (OBCC) ---
        cli(["--expName", "hard", "--optimize", "pme",
             "--pme_criterion", "OBCC", "--nEpochs", "1"], "stage1-hard")
        hard_ckpt = root / "run" / "hard" / "model_1.msgpack"
        assert hard_ckpt.exists(), hard_ckpt

        # --- stages 2+3: convert_to_soft surgery + soft fine-tune ---
        cli(["--expName", "soft", "--optimize", "pme",
             "--pme_criterion", "OBGCC", "--past_flow", "1",
             "--const_vel", "1", "--smooth_second_order", "1",
             "--retrain", str(hard_ckpt), "--convert_to_soft", "1",
             "--nEpochs", "1"], "stage2+3-convert+soft")

        # the stage-3 checkpoint must carry past-flow decoders seeded by
        # the surgery and trained further
        from flax import serialization

        raw = (root / "run" / "soft" / "model_1.msgpack").read_bytes()
        tree = serialization.msgpack_restore(raw)
        past = [k for k in tree if k.startswith("past_decoder_")]
        assert past, "soft checkpoint has no past-flow decoders"
        print(f"\npast-flow decoders in stage-3 checkpoint: {sorted(past)}")

        for exp in ("hard", "soft"):
            cols = (root / "run" / exp / "train.log").read_text()
            print(f"--- {exp}/train.log ---\n{cols}")
        if args.keep:
            import shutil

            for exp in ("hard", "soft"):
                shutil.copytree(root / "run" / exp,
                                Path(args.keep) / exp, dirs_exist_ok=True)
        print("recipe_smoke: ok")


if __name__ == "__main__":
    main()
