"""End-to-end evidence tests.

1. The reference README workflow (README.md:54-71) driven on the
   reference's own sample frames (/root/reference/samples) through
   tools/demo.py — the SURVEY §7 "minimum end-to-end slice".
2. The pretrained-parity harness (tools/parity.py) gated against a
   committed golden `.flo` generated from fixed synthetic weights, so
   the 0.05 px AEPE gate (BASELINE.md north star;
   back2future.lua:97-130) is exercised end-to-end even though the
   Dropbox `.t7` weights are not present in this environment.

Regenerate the golden (after an intentional numerics change) with:
    GOLDEN_REGEN=1 python -m pytest tests/test_parity_demo.py -k golden
"""

import os
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
SAMPLES = Path("/root/reference/samples")
GOLDEN = Path(__file__).resolve().parent / "golden"

sys.path.insert(0, str(REPO / "tools"))


@pytest.mark.skipif(not SAMPLES.is_dir(), reason="reference samples absent")
def test_demo_on_reference_samples(tmp_path):
    """tools/demo.py on frame_0009-0011.png (random weights): the full
    L6->L2->L8 pipeline of SURVEY §7's minimum slice."""
    import demo

    from back2future_tpu.data.sample import default_image_loader
    from back2future_tpu.io.flow_io import load_flo

    frames = [str(SAMPLES / f"frame_{i:04d}.png") for i in (9, 10, 11)]
    demo.main(frames + ["--model", "none", "--out", str(tmp_path)])

    flow = load_flo(tmp_path / "flow.flo")
    assert flow.shape == (375, 1242, 2)
    assert np.isfinite(flow).all()

    viz = default_image_loader(tmp_path / "flow.png")
    assert viz.shape == (375, 1242, 3)
    for name in ("fwd_occ.png", "bwd_occ.png"):
        occ = default_image_loader(tmp_path / name)
        assert occ.shape[:2] == (375, 1242)
        rate = (occ[..., 0] > 0.5).mean()
        assert 0.0 <= rate <= 1.0  # random weights: any rate, but valid


def _golden_model_and_triplet():
    """Deterministic tiny flagship stand-in: fixed-seed weights + frames."""
    import jax
    import jax.numpy as jnp

    from back2future_tpu.models.pwc import PWCConfig, PWCNet

    cfg = PWCConfig(frames=3, levels=4, dtype=jnp.float32)
    net = PWCNet(cfg)
    params = net.init(jax.random.PRNGKey(7),
                      jnp.zeros((1, 64, 128, 9)))["params"]
    rng = np.random.default_rng(3)
    base = rng.random((64, 128, 3)).astype(np.float32)
    # smooth shifted variants so the flow field is non-degenerate
    ims = [np.roll(base, s, axis=1) * 0.8 + 0.1 for s in (-2, 0, 2)]
    return (params, cfg), ims


class TestParityHarness:
    def test_golden_flow_within_tolerance(self, tmp_path):
        """The committed golden reproduces within the 0.05 px gate —
        proving the harness measures what it claims (a real weight
        mismatch shows up as AEPE far above this, see test below)."""
        from parity import compare_flows, run_triplet

        from back2future_tpu.io.flow_io import load_flo, write_flo
        from back2future_tpu.io.png16 import write_png

        model, ims = _golden_model_and_triplet()
        paths = []
        for i, im in enumerate(ims):
            p = tmp_path / f"f{i}.png"
            write_png(p, (im * 255).astype(np.uint8))
            paths.append(str(p))
        flow, fwd_occ, bwd_occ = run_triplet(model, paths, tmp_path / "out")
        assert (tmp_path / "out" / "flow.flo").exists()

        golden_path = GOLDEN / "parity_flow.flo"
        if os.environ.get("GOLDEN_REGEN"):
            GOLDEN.mkdir(exist_ok=True)
            write_flo(golden_path, flow)
            pytest.skip("golden regenerated")
        stats = compare_flows(flow, load_flo(golden_path))
        assert stats["aepe_px"] <= 0.05, stats

    def test_gate_rejects_wrong_weights(self, tmp_path):
        """Perturbed flow must fail the gate (harness isn't vacuous)."""
        from parity import compare_flows

        from back2future_tpu.io.flow_io import load_flo

        golden = load_flo(GOLDEN / "parity_flow.flo")
        stats = compare_flows(golden + 0.01, golden)
        assert stats["aepe_px"] > 0.05

    def test_occlusion_agreement_metric(self):
        from parity import occlusion_agreement

        a = np.zeros((4, 4), bool)
        b = a.copy()
        b[0, 0] = True
        assert occlusion_agreement(a, a) == 1.0
        assert occlusion_agreement(a, b) == pytest.approx(15 / 16)
