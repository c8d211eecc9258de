"""Compact wire-format tests (data/wire.py, --wire compact).

The compact format ships u8 images (ImageNet normalization deferred to
the device) + f16 gt; these tests pin (a) encode/decode equivalence to
the host-normalized f32 pipeline, (b) end-to-end loader + train/eval
step equivalence, and (c) the config guard for the -normalize_images 0
quirk it cannot represent.
"""

import dataclasses as dc

import numpy as np
import pytest

from back2future_tpu.config import Options
from back2future_tpu.data import (FlowDataset, PrefetchLoader, SampleConfig,
                                  SampleSpec, decode_batch, encode_batch,
                                  train_sample)
from back2future_tpu.data import test_sample as eval_sample
from back2future_tpu.io.flow_io import write_disp, write_flo
from back2future_tpu.io.png16 import write_png


@pytest.fixture(scope="module")
def toy(tmp_path_factory):
    """5-frame u8 sequence with .flo/.disp gt for ref frame 3."""
    tmp_path = tmp_path_factory.mktemp("wiretoy")
    rng = np.random.default_rng(0)
    h, w = 40, 56
    for i in range(1, 6):
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        write_png(tmp_path / f"img_{i:02d}.png", img)
    flow = rng.standard_normal((h, w, 2)).astype(np.float32) * 3
    write_flo(tmp_path / "flow_03.flo", flow)
    write_disp(tmp_path / "flow_03_occ_3.disp",
               np.full((h, w), 0.5, np.float32))
    return SampleSpec(str(tmp_path / "img_%02d.png"),
                      str(tmp_path / "flow_%02d.flo"), ref=3, skip=1)


CFG = dict(frames=3, ground_truth=True, fine_height=32, fine_width=48,
           load_height=40, load_width=56, rand_crop=0)


def _batch(spec, wire, train=True, n=2):
    cfg = SampleConfig(wire=wire, **CFG)
    ds = FlowDataset([spec] * 4, cfg, train=train)
    if train:
        return ds.sample(n, np.random.default_rng(5))
    return ds.get(0, n)


class TestEncodeDecode:
    def test_u8_images_lossless_no_augment(self, toy):
        """u8-sourced, non-augmented images round-trip bit-exact: the
        decode's /255 + normalize reproduces the f32 pipeline."""
        for train in (True, False):
            ref = _batch(toy, "f32", train=train)
            compact = _batch(toy, "compact", train=train)
            assert compact["images"].dtype == np.uint8
            assert compact["flow_gt"].dtype == np.float16
            assert compact["mask"].dtype == np.uint8
            dec = {k: np.asarray(v) for k, v in decode_batch(
                {k: np.asarray(v) for k, v in compact.items()}).items()}
            np.testing.assert_allclose(dec["images"], ref["images"],
                                       atol=1e-6)
            np.testing.assert_allclose(dec["flow_gt"], ref["flow_gt"],
                                       atol=2.5e-4)  # f16 half-ulp at
            #                                          |flow/20| in [0.5,1)
            np.testing.assert_array_equal(dec["occ_gt"], ref["occ_gt"])
            np.testing.assert_array_equal(dec["mask"], ref["mask"])

    def test_decode_noop_on_f32(self, toy):
        ref = _batch(toy, "f32")
        dec = decode_batch(ref)
        assert dec is ref

    def test_encode_rejects_unknown(self, toy):
        with pytest.raises(ValueError, match="wire format"):
            encode_batch({"images": np.zeros((1, 2, 2, 9))}, "f8")

    def test_wire_bytes_shrink(self, toy):
        ref = _batch(toy, "f32")
        compact = _batch(toy, "compact")
        size = lambda b: sum(v.nbytes for v in b.values())  # noqa: E731
        assert size(compact) < size(ref) / 3

    def test_augmented_quantization_bounded(self, toy):
        """With -augment 1 the jittered floats re-quantize to the 8-bit
        grid; the decoded images stay within half a quantum (in
        normalized units, 1/510/std) of the float pipeline."""
        a = dict(CFG, rand_crop=1)
        a["fine_height"], a["fine_width"] = 24, 32
        cfg_f = SampleConfig(wire="f32", augment=1, **a)
        cfg_c = SampleConfig(wire="compact", augment=1, **a)
        rng = lambda: np.random.default_rng(11)  # noqa: E731
        img_f, *_ = train_sample(toy, cfg_f, rng())
        # sample stays float [0,1]-ish; quantization happens at collate
        img_c, tgt_c, msk_c = train_sample(toy, cfg_c, rng())
        enc = encode_batch(
            {"images": img_c[None], "flow_gt": tgt_c[None, ..., :2],
             "occ_gt": tgt_c[None, ..., 2:], "mask": msk_c[None]},
            "compact")
        assert enc["images"].dtype == np.uint8
        dec = np.asarray(decode_batch(enc)["images"])[0]
        # max |error| = 0.5/255 in [0,1] units (plus clipping of jitter
        # overshoot), /min(std) in normalized units
        overshoot = max(img_c.max() - 1.0, 0.0 - img_c.min(), 0.0)
        tol = (0.5 / 255 + overshoot) / 0.224 + 1e-6
        assert np.abs(dec - img_f).max() <= tol


class TestStepEquivalence:
    @pytest.fixture(scope="class")
    def opt(self):
        return Options(dataset="Toy", frames=3, levels=5, pwc_skip=1,
                       cropHeight=32, cropWidth=48, batchSize=2,
                       ground_truth=True, pme_criterion="OBCC",
                       nDonkeys=0, epochSize=2).derive()

    def _loader_batch(self, toy, opt, wire):
        o = dc.replace(opt, wire=wire)
        cfg = SampleConfig.from_options(o)
        ds = FlowDataset([toy] * 4, cfg, train=True)
        loader = PrefetchLoader(ds, 2, 1, n_workers=0, manual_seed=3)
        return next(iter(loader))

    def test_train_step_matches_f32(self, toy, opt):
        """One jitted train step over the SAME samples: the compact-wire
        losses/metrics/updates match the f32 pipeline (images decode
        bit-exact; only the f16 gt used by metrics can differ, at f16
        resolution)."""
        import jax

        from back2future_tpu.losses import build_criterions
        from back2future_tpu.models.factory import model_and_config
        from back2future_tpu.train.state import create_train_state
        from back2future_tpu.train.step import make_eval_step, make_train_step

        model, _ = model_and_config(opt)
        params = model.init(jax.random.PRNGKey(0),
                            np.zeros((1, 32, 48, 9), np.float32))["params"]
        crits = build_criterions(opt)
        step = make_train_step(model, opt, crits, donate=False)
        estep = make_eval_step(model, opt, crits)

        bf = self._loader_batch(toy, opt, "f32")
        bc = self._loader_batch(toy, opt, "compact")
        assert bc["images"].dtype == np.uint8

        s0 = create_train_state(params, opt, epoch=1)
        sf, lf = step(s0, bf)
        s0 = create_train_state(params, opt, epoch=1)
        sc, lc = step(s0, bc)
        for k in lf:
            np.testing.assert_allclose(float(lf[k]), float(lc[k]),
                                       rtol=1e-4, atol=1e-4, err_msg=k)
        # params after one update agree to float tolerance
        flat_f = jax.tree_util.tree_leaves(sf.params)
        flat_c = jax.tree_util.tree_leaves(sc.params)
        for a, b in zip(flat_f, flat_c):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

        ef = estep(params, bf)
        ec = estep(params, bc)
        for k in ef:
            np.testing.assert_allclose(float(ef[k]), float(ec[k]),
                                       rtol=1e-4, atol=1e-4, err_msg=k)


class TestConfigGuard:
    def test_compact_requires_normalized(self):
        with pytest.raises(ValueError, match="normalize_images"):
            Options(wire="compact", normalize_images=0).derive()

    def test_unknown_wire_rejected(self):
        with pytest.raises(ValueError, match="wire"):
            Options(wire="u8").derive()

    def test_sampleconfig_carries_wire(self):
        opt = Options(wire="compact").derive()
        assert SampleConfig.from_options(opt).wire == "compact"
        assert SampleConfig.from_options(opt).defer_normalize


class TestTestHookDefer:
    def test_eval_sample_unnormalized_u8_range(self, toy):
        cfg = SampleConfig(wire="compact", **CFG)
        images, _, _ = eval_sample(toy, cfg)
        # deferred normalization: pixels stay in [0,1]
        assert images.min() >= 0.0 and images.max() <= 1.0
