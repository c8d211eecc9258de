"""Data pipeline tests: manifests, hooks, augmentation, prefetch loader."""

import numpy as np
import pytest

from back2future_tpu.data import (
    FlowDataset, PrefetchLoader, SampleConfig, SampleSpec, collate,
    load_manifest, load_split, make_data, train_sample, write_manifest,
)
from back2future_tpu.data import test_sample as eval_sample
from back2future_tpu.data.augment import (
    GeometricParams, augment_sample, color_normalize, gaussian_noise,
    pca_lighting, rotation_flow_field, rotate_flow_vectors, translate,
    IMAGENET_MEAN, IMAGENET_STD,
)
from back2future_tpu.io.flow_io import write_flo, write_disp
from back2future_tpu.io.png16 import write_png


# ------------------------------------------------------------------ manifests

class TestManifest:
    def test_parse_no_gt(self, tmp_path):
        p = tmp_path / "d.dat"
        p.write_text("[PATH]/img_%02d.png 2\n[PATH]/b_%02d.png 5 2\n\n")
        specs = load_manifest(p, ground_truth=False, root="/data")
        assert len(specs) == 2
        assert specs[0].image_pattern == "/data/img_%02d.png"
        assert specs[0].ref == 2 and specs[0].skip == 1
        assert specs[1].skip == 2

    def test_parse_gt(self, tmp_path):
        p = tmp_path / "d.dat"
        p.write_text("i_%02d.png f_%02d.flo 3 1\n")
        (spec,) = load_manifest(p, ground_truth=True)
        assert spec.flow_pattern == "f_%02d.flo"
        assert spec.ref == 3

    def test_frame_window(self):
        s = SampleSpec("i_%d.png", None, ref=5, skip=2)
        # frames=3: start = 5 - 1*2 = 3 -> [3, 5, 7]
        assert s.frame_indices(3) == [3, 5, 7]
        assert s.frame_indices(5) == [1, 3, 5, 7, 9]
        # 2-frame windows start at ref (donkey.lua:205-207)
        assert s.frame_indices(2) == [5, 7]

    def test_occ_paths(self):
        s = SampleSpec("i_%d.png", "f_%02d.flo", ref=3, skip=1)
        occ_n, occ_3 = s.occ_paths(5)
        assert occ_n == "f_03_occ_5.disp"
        assert occ_3 == "f_03_occ_3.disp"
        # 2-frame: both use the 3-frame map (donkey.lua:226-229)
        occ_n, _ = s.occ_paths(2)
        assert occ_n == "f_03_occ_3.disp"

    def test_occ_paths_png_flow(self):
        """KITTI 16-bit-PNG flow patterns (a port extension) must still
        derive .disp occ paths — the reference's gsub('.flo', ...) would
        no-op and hand the flow PNG itself to the .disp loader."""
        s = SampleSpec("i_%d.png", "f_%06d_10.png", ref=3, skip=1)
        occ_n, occ_3 = s.occ_paths(5)
        assert occ_n == "f_000003_10_occ_5.disp"
        assert occ_3 == "f_000003_10_occ_3.disp"

    def test_split(self, tmp_path):
        p = tmp_path / "s.dat"
        p.write_text("1\n2\n1\n1\n2\n")
        tr, va = load_split(p)
        assert tr.tolist() == [0, 2, 3]
        assert va.tolist() == [1, 4]

    def test_roundtrip_gt(self, tmp_path):
        specs = [SampleSpec("a_%d.png", "f_%d.flo", 2, 1),
                 SampleSpec("b_%d.png", "g_%d.flo", 4, 2)]
        p = tmp_path / "m.dat"
        write_manifest(p, specs)
        assert load_manifest(p, ground_truth=True) == specs

    def test_roundtrip_no_gt(self, tmp_path):
        specs = [SampleSpec("a_%d.png", None, 2, 1),
                 SampleSpec("b_%d.png", None, 4, 2)]
        p = tmp_path / "m.dat"
        write_manifest(p, specs)
        assert load_manifest(p, ground_truth=False) == specs


class TestShippedManifests:
    """The repo ships the reference's real manifest set (datasets/);
    validate the parser against them (donkey.lua:70-94; SURVEY §2.5)."""

    DATASETS = None  # set in setup

    @pytest.fixture(autouse=True)
    def _dir(self):
        from pathlib import Path
        self.DATASETS = Path(__file__).resolve().parent.parent / "datasets"

    def test_kitti2015(self):
        specs = load_manifest(self.DATASETS / "Kitti2015.dat",
                              ground_truth=False, root="/data/kitti")
        assert len(specs) == 3000
        assert specs[0].image_pattern == \
            "/data/kitti/training/image_2/000000_%02d.png"
        assert all(s.flow_pattern is None and s.skip == 1 for s in specs)
        # 200 scenes x refs 1..15 (multiview window minus edges)
        refs = {s.ref for s in specs}
        assert min(refs) >= 1 and len(specs) % len(refs) == 0
        # a 3-frame window resolves to existing-style %02d paths
        assert specs[0].image_paths(3) == [
            f"/data/kitti/training/image_2/000000_{i:02d}.png"
            for i in specs[0].frame_indices(3)]
        tr, va = load_split(self.DATASETS / "Kitti2015_split.dat")
        assert len(tr) + len(va) == 3000 and len(va) > 0

    def test_sintel(self):
        specs = load_manifest(self.DATASETS / "Sintel.dat",
                              ground_truth=True, root="/data/sintel")
        assert len(specs) == 2036
        s0 = specs[0]
        assert s0.image_pattern == \
            "/data/sintel/training/clean/alley_1/frame_%04d.png"
        assert s0.flow_pattern == \
            "/data/sintel/training/flow/alley_1/frame_%04d.flo"
        assert s0.flow_path() == s0.flow_pattern % s0.ref
        occ_n, occ_3 = s0.occ_paths(3)
        assert occ_n.endswith("_occ_3.disp") and occ_3.endswith("_occ_3.disp")
        tr, va = load_split(self.DATASETS / "Sintel_split.dat")
        assert len(tr) + len(va) == 2036 and len(va) > 0

    def test_roaming_split(self):
        tr, va = load_split(self.DATASETS / "RoamingImages_split.dat")
        assert len(tr) + len(va) == 80000


# ------------------------------------------------------------------ photometric

class TestPhotometric:
    def test_color_normalize_groups(self):
        img = np.ones((4, 4, 6), np.float32) * 0.5
        out = color_normalize(img)
        expect = (0.5 - IMAGENET_MEAN) / IMAGENET_STD
        np.testing.assert_allclose(out[0, 0, :3], expect, rtol=1e-6)
        np.testing.assert_allclose(out[0, 0, 3:], expect, rtol=1e-6)

    def test_lighting_identity_at_zero(self):
        rng = np.random.default_rng(0)
        img = rng.random((4, 4, 9)).astype(np.float32)
        np.testing.assert_array_equal(pca_lighting(img, rng, 0.0), img)

    def test_lighting_same_shift_per_group(self):
        rng = np.random.default_rng(0)
        img = np.zeros((2, 2, 6), np.float32)
        out = pca_lighting(img, rng, 0.1)
        np.testing.assert_allclose(out[..., :3], out[..., 3:], rtol=1e-6)

    def test_gaussian_noise_gate(self):
        rng = np.random.default_rng(0)
        img = np.concatenate([np.zeros((8, 8, 1), np.float32),
                              np.ones((8, 8, 1), np.float32) * 0.5,
                              np.ones((8, 8, 1), np.float32)], axis=-1)
        out = gaussian_noise(img, rng, 2.0)
        # out-of-range pixels are zeroed, not clipped (donkey.lua:259-266)
        assert ((out >= 0) & (out <= 1)).all()
        assert (out == 0).any()


# ------------------------------------------------------------------ geometric

def _id_params(**kw):
    base = dict(hflip=False, vflip=False, tx=0.0, ty=0.0, r1=0.0, r2=0.0,
                scale=1.0, crop_y=0, crop_x=0)
    base.update(kw)
    return GeometricParams(**base)


class TestGeometric:
    def test_translate(self):
        img = np.zeros((4, 4, 1), np.float32)
        img[1, 1, 0] = 1.0
        out = translate(img, 1, 2)
        assert out[3, 2, 0] == 1.0 and out.sum() == 1.0

    def test_rotation_flow_field_center_zero(self):
        f = rotation_flow_field(8, 8, 0.1)
        # u depends only on row, v only on column; antisymmetric about center
        assert np.allclose(f[:, 0, 0], f[:, -1, 0])
        assert np.allclose(f[0, :, 1], f[-1, :, 1])
        # 1-based center: rows 3/4 (0-based) bracket H/2=4
        assert f[3, 0, 0] == 0.0  # (3+1 - 4)*r2 = 0

    def test_vector_rotation_inverse(self):
        rng = np.random.default_rng(0)
        flow = rng.standard_normal((5, 5, 2)).astype(np.float32)
        back = rotate_flow_vectors(rotate_flow_vectors(flow, 0.3), -0.3)
        np.testing.assert_allclose(back, flow, atol=1e-6)

    def test_hflip_negates_u(self):
        rng = np.random.default_rng(1)
        frames = [rng.random((8, 10, 3)).astype(np.float32) for _ in range(3)]
        flow = rng.standard_normal((8, 10, 2)).astype(np.float32)
        occ = rng.random((8, 10, 2)).astype(np.float32)
        mask = np.ones((8, 10), np.float32)
        img, fl, oc, mk = augment_sample(
            frames, flow, occ, mask, _id_params(hflip=True), ref0=1)
        np.testing.assert_allclose(fl[..., 0], -flow[:, ::-1, 0], atol=1e-6)
        np.testing.assert_allclose(fl[..., 1], flow[:, ::-1, 1], atol=1e-6)
        np.testing.assert_allclose(img[..., 3:6], frames[1][:, ::-1], atol=1e-6)

    def test_vflip_negates_v(self):
        rng = np.random.default_rng(1)
        frames = [rng.random((8, 10, 3)).astype(np.float32) for _ in range(3)]
        flow = rng.standard_normal((8, 10, 2)).astype(np.float32)
        occ = rng.random((8, 10, 2)).astype(np.float32)
        mask = np.ones((8, 10), np.float32)
        _, fl, _, _ = augment_sample(
            frames, flow, occ, mask, _id_params(vflip=True), ref0=1)
        np.testing.assert_allclose(fl[..., 1], -flow[::-1, :, 1], atol=1e-6)

    def test_translation_adds_to_flow(self):
        frames = [np.zeros((8, 10, 3), np.float32) for _ in range(3)]
        flow = np.zeros((8, 10, 2), np.float32)
        occ = np.full((8, 10, 2), 0.5, np.float32)
        mask = np.ones((8, 10), np.float32)
        _, fl, _, _ = augment_sample(
            frames, flow, occ, mask, _id_params(tx=3.0, ty=2.0), ref0=1)
        np.testing.assert_allclose(fl[..., 0], 3.0)
        np.testing.assert_allclose(fl[..., 1], 2.0)

    def test_scale_scales_flow_magnitude(self):
        frames = [np.zeros((8, 10, 3), np.float32) for _ in range(3)]
        flow = np.ones((8, 10, 2), np.float32)
        occ = np.full((8, 10, 2), 0.5, np.float32)
        mask = np.ones((8, 10), np.float32)
        img, fl, oc, mk = augment_sample(
            frames, flow, occ, mask, _id_params(scale=2.0), ref0=1)
        assert img.shape == (16, 20, 9)
        np.testing.assert_allclose(fl, 2.0, atol=1e-5)
        assert oc.shape == (16, 20, 2)


# ------------------------------------------------------------------ hooks + loader

def _boom(path):
    """Module-level failing image loader (picklable for spawn workers)."""
    raise RuntimeError("decode failed")


@pytest.fixture
def toy_dataset(tmp_path):
    """5-frame synthetic sequence with .flo/.disp gt for ref frame 3."""
    rng = np.random.default_rng(0)
    h, w = 40, 56
    for i in range(1, 6):
        img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        write_png(tmp_path / f"img_{i:02d}.png", img)
    flow = rng.standard_normal((h, w, 2)).astype(np.float32) * 3
    write_flo(tmp_path / "flow_03.flo", flow)
    write_disp(tmp_path / "flow_03_occ_3.disp",
               np.full((h, w), 0.5, np.float32))
    spec = SampleSpec(str(tmp_path / "img_%02d.png"),
                      str(tmp_path / "flow_%02d.flo"), ref=3, skip=1)
    return spec, flow, (h, w)


class TestHooks:
    def test_test_sample_gt(self, toy_dataset):
        spec, flow, (h, w) = toy_dataset
        cfg = SampleConfig(frames=3, ground_truth=True, fine_height=32,
                           fine_width=48, load_height=32, load_width=48,
                           rand_crop=0)
        images, target, mask = eval_sample(spec, cfg)
        assert images.shape == (32, 48, 9)
        assert target.shape == (32, 48, 4)
        assert mask.shape == (32, 48)
        # center crop of flow / flownet_factor
        y0, x0 = (h - 32) // 2, (w - 48) // 2
        np.testing.assert_allclose(
            target[..., :2], flow[y0:y0 + 32, x0:x0 + 48] / 20.0, atol=1e-5)
        # occ channel 0: no 3-frame-specific _occ file -> 0.5 fill via _occ_3
        np.testing.assert_allclose(target[..., 2], 0.5)

    def test_train_sample_no_augment(self, toy_dataset):
        spec, _, _ = toy_dataset
        cfg = SampleConfig(frames=3, ground_truth=False, fine_height=32,
                           fine_width=48, load_height=32, load_width=48)
        rng = np.random.default_rng(3)
        images, target, mask = train_sample(spec, cfg, rng)
        assert images.shape == (32, 48, 9)
        # no gt: zero flow, 0.5 occ
        np.testing.assert_allclose(target[..., :2], 0.0)
        np.testing.assert_allclose(target[..., 2:], 0.5)
        np.testing.assert_allclose(mask, 1.0)

    def test_train_sample_augmented(self, toy_dataset):
        spec, _, _ = toy_dataset
        cfg = SampleConfig(frames=3, ground_truth=True, augment=1,
                           fine_height=24, fine_width=32,
                           load_height=32, load_width=48)
        rng = np.random.default_rng(3)
        images, target, mask = train_sample(spec, cfg, rng)
        assert images.shape == (24, 32, 9)
        assert np.isfinite(images).all() and np.isfinite(target).all()

    def test_determinism_per_seed(self, toy_dataset):
        spec, _, _ = toy_dataset
        cfg = SampleConfig(frames=3, augment=1, fine_height=24, fine_width=32,
                           load_height=32, load_width=48)
        a = train_sample(spec, cfg, np.random.default_rng(7))
        b = train_sample(spec, cfg, np.random.default_rng(7))
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)

    def test_global_scale_option(self, toy_dataset):
        """-scale with dims that truncate to a slightly different aspect
        ratio (int(40*.5)/40 != int(72*.5)/72 at some sizes) must not
        crash, and flow magnitudes scale by the ORIGINAL factor — the
        reference's scaleFlow multiplies by exactly scaleFactor
        (donkey.lua:112-118 receives float iH*scaleFactor)."""
        spec, flow, (h, w) = toy_dataset
        base = SampleConfig(frames=3, ground_truth=True, fine_height=12,
                            fine_width=16, load_height=32, load_width=48,
                            rand_crop=0, flownet_factor=1.0)
        import dataclasses as dc
        # 0.4 truncates 40x56 -> 16x22: 16/40=0.400 vs 22/56=0.393 — the
        # dims an sc-from-raster derivation would reject
        scaled = dc.replace(base, scale=0.4)
        _, t_scaled, _ = eval_sample(spec, scaled)
        _, t_base, _ = eval_sample(spec, base)
        assert t_scaled.shape == (12, 16, 4)
        assert np.isfinite(t_scaled).all()
        # magnitude scales by ~0.4
        ratio = (np.abs(t_scaled[..., :2]).mean()
                 / max(np.abs(t_base[..., :2]).mean(), 1e-9))
        assert 0.25 < ratio < 0.55, ratio

    def test_short_sample_raises(self, toy_dataset):
        spec, _, _ = toy_dataset
        cfg = SampleConfig(frames=3, ground_truth=False, fine_height=400,
                           fine_width=48, load_height=32, load_width=48)
        with pytest.raises(ValueError, match="smaller than the fine"):
            train_sample(spec, cfg, np.random.default_rng(0))


class TestLoader:
    def _dataset(self, toy, n=6, train=True):
        spec, _, _ = toy
        cfg = SampleConfig(frames=3, fine_height=24, fine_width=32,
                           load_height=32, load_width=48)
        return FlowDataset([spec] * n, cfg, train=train)

    def test_train_load_requires_rng(self, toy_dataset):
        ds = self._dataset(toy_dataset)
        with pytest.raises(ValueError, match="explicit rng"):
            ds.load(0)

    def test_queue_depth_validated(self, toy_dataset):
        ds = self._dataset(toy_dataset)
        with pytest.raises(ValueError, match="queue_depth"):
            PrefetchLoader(ds, 2, 2, queue_depth=0)

    def test_collate_shapes(self, toy_dataset):
        ds = self._dataset(toy_dataset)
        batch = ds.sample(4, np.random.default_rng(0))
        assert batch["images"].shape == (4, 24, 32, 9)
        assert batch["flow_gt"].shape == (4, 24, 32, 2)
        assert batch["occ_gt"].shape == (4, 24, 32, 2)
        assert batch["mask"].shape == (4, 24, 32)

    def test_get_range(self, toy_dataset):
        ds = self._dataset(toy_dataset, train=False)
        batch = ds.get(0, 3)
        assert batch["images"].shape[0] == 3

    def test_prefetch_matches_sync_count(self, toy_dataset):
        ds = self._dataset(toy_dataset)
        loader = PrefetchLoader(ds, batch_size=2, n_batches=5, n_workers=3,
                                manual_seed=2)
        batches = list(loader)
        assert len(batches) == 5
        assert all(b["images"].shape == (2, 24, 32, 9) for b in batches)

    def test_sequential_prefetch_order(self, toy_dataset):
        ds = self._dataset(toy_dataset, train=False)
        loader = PrefetchLoader(ds, batch_size=2, n_batches=3, n_workers=2,
                                sequential=True)
        sync = PrefetchLoader(ds, batch_size=2, n_batches=3, n_workers=0,
                              sequential=True)
        for a, b in zip(loader, sync):
            np.testing.assert_array_equal(a["images"], b["images"])

    def test_epochs_draw_fresh_samples(self, toy_dataset):
        """Re-iterating must NOT replay epoch 0's indices/augmentations
        (the reference's long-lived donkeys see fresh draws each epoch,
        data.lua:32-37)."""
        ds = self._dataset(toy_dataset)
        loader = PrefetchLoader(ds, batch_size=2, n_batches=3, n_workers=0,
                                manual_seed=2)
        e0 = [b["images"].copy() for b in loader]
        e1 = [b["images"].copy() for b in loader]
        assert any(not np.array_equal(a, b) for a, b in zip(e0, e1))
        # ...but a fresh loader with the same seed replays deterministically
        again = PrefetchLoader(ds, batch_size=2, n_batches=3, n_workers=0,
                               manual_seed=2)
        for a, b in zip(again, e0):
            np.testing.assert_array_equal(a["images"], b)

    def test_scene_batches_coherent(self, toy_dataset, monkeypatch):
        """scene_batches=k draws each batch from k distinct scenes (the
        saddle-escape sampler, config.Options.scene_batches), evenly
        split, deterministic under the standard (seed, epoch, slot)
        scheme."""
        ds = self._dataset(toy_dataset, n=16)
        monkeypatch.setattr(ds, "load", lambda i, rng=None: int(i))
        monkeypatch.setattr(ds, "collate_batch", lambda xs: list(xs))
        loader = PrefetchLoader(ds, batch_size=8, n_batches=6, n_workers=0,
                                manual_seed=2, scene_batches=1)
        batches = list(loader)
        assert all(len(set(b)) == 1 for b in batches)  # one scene per batch
        assert len({b[0] for b in batches}) > 1        # ...varying by slot
        # replay determinism with a fresh loader
        again = PrefetchLoader(ds, batch_size=8, n_batches=6, n_workers=0,
                               manual_seed=2, scene_batches=1)
        assert list(again) == batches
        # k=2: at most 2 distinct scenes, grouped contiguously 4+4
        loader2 = PrefetchLoader(ds, batch_size=8, n_batches=6, n_workers=0,
                                 manual_seed=2, scene_batches=2)
        for b in loader2:
            assert len(set(b)) <= 2
            assert b[:4] == [b[0]] * 4 and b[4:] == [b[4]] * 4
        # k >= n_scenes: full-set batches — every scene in every batch,
        # identical composition across slots (deterministic full-batch
        # steps for the saddle escape)
        full = PrefetchLoader(ds, batch_size=20, n_batches=3, n_workers=0,
                              manual_seed=2, scene_batches=16)
        batches = list(full)
        for b in batches:
            assert sorted(set(b)) == list(range(16))
            assert b == batches[0]

    def test_deterministic_sample_memo(self, toy_dataset):
        """With a deterministic hook (augment/noise off, rand_crop 0) the
        loader memoizes decoded samples across epochs: batches stay
        byte-identical to the uncached loader, and the underlying
        dataset.load is not re-hit after the first epoch."""
        spec, _, _ = toy_dataset
        cfg = SampleConfig(frames=3, fine_height=24, fine_width=32,
                           load_height=32, load_width=48, rand_crop=0)
        ds = FlowDataset([spec] * 6, cfg, train=True)
        assert ds.deterministic
        cached = PrefetchLoader(ds, batch_size=2, n_batches=3, n_workers=0,
                                manual_seed=2)
        assert cached._sample_cache is not None
        plain = PrefetchLoader(ds, batch_size=2, n_batches=3, n_workers=0,
                               manual_seed=2)
        plain._sample_cache = None
        e0 = []
        for a, b in zip(cached, plain):
            np.testing.assert_array_equal(a["images"], b["images"])
            np.testing.assert_array_equal(a["flow_gt"], b["flow_gt"])
            e0.append(b["images"].copy())
        calls = []
        orig = ds.load
        ds.load = lambda i, rng=None: (calls.append(i), orig(i, rng))[1]
        cached.set_epoch(0)  # replay epoch 0: all indices memoized
        for a, b in zip(cached, e0):
            np.testing.assert_array_equal(a["images"], b)
        assert not calls
        ds.load = orig
        # rand_crop=1 consumes rng: memo must stay off
        rc = FlowDataset([spec] * 6, SampleConfig(
            frames=3, fine_height=24, fine_width=32,
            load_height=32, load_width=48, rand_crop=1), train=True)
        assert not rc.deterministic
        assert PrefetchLoader(rc, 2, 2)._sample_cache is None
        # ...but the testHook is always deterministic
        assert FlowDataset([spec] * 6, cfg, train=False).deterministic

    def test_worker_error_propagates(self, toy_dataset):
        # _boom is module-level so the dataset stays picklable — the
        # process pool spawns (not forks) when JAX is live in the parent,
        # as it is by the time the suite reaches this test
        ds = self._dataset(toy_dataset)
        ds.image_loader = _boom
        loader = PrefetchLoader(ds, batch_size=2, n_batches=2, n_workers=2)
        with pytest.raises(RuntimeError, match="decode failed"):
            list(loader)

    def test_unpicklable_dataset_under_spawn_is_diagnosed(self, toy_dataset,
                                                          monkeypatch):
        """Spawn ships the dataset by pickle; a local closure must fail
        with the actionable message, not a bare reduction error."""
        monkeypatch.setenv("B2F_MP_START", "spawn")
        ds = self._dataset(toy_dataset)
        ds.image_loader = lambda path: None  # unpicklable on purpose
        loader = PrefetchLoader(ds, batch_size=2, n_batches=2, n_workers=2)
        with pytest.raises(RuntimeError, match="not picklable"):
            list(loader)


class TestFastAugment:
    """augment_sample_cropped must be bit-identical to augment_sample +
    the train_sample load crop (the windowed fast path vs the full-
    resolution reference path)."""

    @staticmethod
    def _fixture(seed, nf):
        rng = np.random.default_rng(seed)
        h, w = 93, 151
        frames = [rng.random((h, w, 3)).astype(np.float32)
                  for _ in range(nf)]
        flow = (rng.standard_normal((h, w, 2)) * 5).astype(np.float32)
        occ = rng.choice([0.0, 0.5, 1.0], (h, w, 2)).astype(np.float32)
        mask = (rng.random((h, w)) > 0.3).astype(np.float32)
        return rng, frames, flow, occ, mask

    def _check(self, params, nf=3, seed=0, lh=64, lw=96):
        import dataclasses as dc

        from back2future_tpu.data.augment import augment_sample_cropped

        _, frames, flow, occ, mask = self._fixture(seed, nf)
        ref0 = 0 if nf == 2 else (nf - 1) // 2
        simages, sflow, socc, smask = augment_sample(
            [f.copy() for f in frames], flow.copy(), occ.copy(),
            mask.copy(), params, ref0)
        ih, iw = simages.shape[:2]
        y0 = min(params.crop_y, max(ih - lh, 0))
        x0 = min(params.crop_x, max(iw - lw, 0))
        sl = np.s_[y0:y0 + lh, x0:x0 + lw]
        fimages, fflow, focc, fmask = augment_sample_cropped(
            frames, flow, occ, mask, params, ref0, lh, lw)
        np.testing.assert_array_equal(fimages, simages[sl])
        np.testing.assert_allclose(fflow, sflow[sl], rtol=0, atol=1e-5)
        np.testing.assert_array_equal(focc, socc[sl])
        np.testing.assert_allclose(fmask, smask[sl], rtol=0, atol=1e-6)

    def test_identity(self):
        self._check(_id_params())

    def test_flips(self):
        self._check(_id_params(hflip=True, vflip=True))

    def test_rotations(self):
        self._check(_id_params(r1=0.13, r2=-0.07))

    def test_translations(self):
        self._check(_id_params(tx=6.4, ty=3.2))

    def test_scale(self):
        self._check(_id_params(scale=1.63, crop_y=11, crop_x=23))

    @pytest.mark.parametrize("seed,nf", [(0, 2), (1, 3), (2, 5), (3, 3),
                                         (4, 3), (5, 5), (6, 2), (7, 3)])
    def test_random_params(self, seed, nf):
        from back2future_tpu.data.augment import sample_geometric

        rng, *_ = self._fixture(seed, nf)
        params = sample_geometric(rng, 93, 151, 64, 96)
        self._check(params, nf=nf, seed=seed)

    def test_train_sample_paths_agree(self, toy_dataset, monkeypatch):
        """End-to-end: train_sample with the fast path on vs off, same
        rng stream, identical outputs."""
        spec, _flow, (h, w) = toy_dataset
        cfg = SampleConfig(ground_truth=True, augment=1, fine_height=24,
                           fine_width=32, load_height=32, load_width=40)
        a = train_sample(spec, cfg, np.random.default_rng(7))
        monkeypatch.setenv("B2F_FAST_AUGMENT", "0")
        b = train_sample(spec, cfg, np.random.default_rng(7))
        for x, y in zip(a, b):
            np.testing.assert_allclose(x, y, rtol=0, atol=1e-5)


class TestNativePhotometric:
    def test_native_matches_numpy(self):
        from back2future_tpu.data.augment import _photo_native, preprocess
        if _photo_native() is None:
            pytest.skip("native lib unavailable")
        rng = np.random.default_rng(3)
        img = rng.random((50, 70, 9)).astype(np.float32)
        a = preprocess(img.copy(), np.random.default_rng(11))
        # force the NumPy path with a non-f32 dtype, compare in f32
        b = preprocess(img.copy().astype(np.float64),
                       np.random.default_rng(11)).astype(np.float32)
        np.testing.assert_allclose(a, b, rtol=0, atol=2e-5)

    def test_rng_stream_parity(self):
        """Both implementations must consume identical rng draws so a
        seeded run is reproducible regardless of backend."""
        from back2future_tpu.data.augment import _photo_native, preprocess
        if _photo_native() is None:
            pytest.skip("native lib unavailable")
        img = np.zeros((4, 4, 9), np.float32)
        r1, r2 = np.random.default_rng(5), np.random.default_rng(5)
        preprocess(img.copy(), r1)
        preprocess(img.copy().astype(np.float64), r2)
        assert r1.integers(1 << 30) == r2.integers(1 << 30)


class TestLoaderModes:
    """All three worker modes (and the spawn start method) must deliver
    the same number of well-formed batches; sequential mode must be
    order-identical across modes."""

    def _ds(self, toy, train=False):
        spec, _, _ = toy
        cfg = SampleConfig(frames=3, fine_height=24, fine_width=32,
                           load_height=32, load_width=48)
        return FlowDataset([spec] * 6, cfg, train=train)

    @pytest.mark.parametrize("mode", ["thread", "process"])
    def test_sequential_identical_across_modes(self, toy_dataset, mode):
        ds = self._ds(toy_dataset)
        pool = PrefetchLoader(ds, batch_size=2, n_batches=3, n_workers=2,
                              sequential=True, worker_mode=mode)
        sync = PrefetchLoader(ds, batch_size=2, n_batches=3, n_workers=0,
                              sequential=True)
        for a, b in zip(pool, sync):
            np.testing.assert_array_equal(a["images"], b["images"])

    def test_spawn_start_method(self, toy_dataset, monkeypatch):
        monkeypatch.setenv("B2F_MP_START", "spawn")
        ds = self._ds(toy_dataset)
        loader = PrefetchLoader(ds, batch_size=2, n_batches=2, n_workers=2,
                                sequential=True, worker_mode="process")
        batches = list(loader)
        assert len(batches) == 2
        assert batches[0]["images"].shape == (2, 24, 32, 9)

    def test_auto_start_method_spawns_when_jax_live(self, toy_dataset,
                                                    monkeypatch):
        """With no B2F_MP_START override and a live JAX backend (the test
        process initialized CPU in conftest), the pool must pick spawn —
        forking a JAX-threaded parent risks a child deadlock."""
        import jax

        from back2future_tpu.data.loader import _jax_backend_live

        jax.devices()  # ensure the backend is live even if run alone
        assert _jax_backend_live()
        monkeypatch.delenv("B2F_MP_START", raising=False)
        ds = self._ds(toy_dataset)
        loader = PrefetchLoader(ds, batch_size=2, n_batches=2, n_workers=2,
                                sequential=True, worker_mode="process")
        batches = list(loader)  # spawn path end to end
        assert len(batches) == 2


class TestManifestCache:
    """On-disk loader metadata cache (donkey.lua:27-33 analog), with the
    mtime/size staleness check the reference leaves to the user."""

    def _write(self, tmp_path, n=4):
        from back2future_tpu.data import SampleSpec, write_manifest

        p = tmp_path / "toy.dat"
        p.parent.mkdir(parents=True, exist_ok=True)
        write_manifest(p, [SampleSpec("[PATH]/img_%02d.png", None, r, 1)
                           for r in range(2, 2 + n)])
        return p

    def test_roundtrip_and_hit(self, tmp_path):
        from back2future_tpu.data import load_manifest, load_manifest_cached

        p = self._write(tmp_path)
        cache = tmp_path / "cache"
        want = load_manifest(p, False, root="/data")
        got = load_manifest_cached(p, False, root="/data", cache_dir=cache)
        assert got == want
        assert list(cache.glob("toy_*_manifestCache.json"))
        # poison the manifest WITHOUT touching mtime/size: the cache must
        # be what is served
        again = load_manifest_cached(p, False, root="/data", cache_dir=cache)
        assert again == want

    def test_same_stem_different_dirs_dont_collide(self, tmp_path):
        from back2future_tpu.data import load_manifest_cached

        pa = self._write(tmp_path / "dsA", n=3)
        pb = self._write(tmp_path / "dsB", n=5)
        cache = tmp_path / "cache"
        a = load_manifest_cached(pa, False, root="/d", cache_dir=cache)
        b = load_manifest_cached(pb, False, root="/d", cache_dir=cache)
        # both cached under distinct files; re-reads hit their own entry
        assert len(list(cache.glob("toy_*_manifestCache.json"))) == 2
        assert len(load_manifest_cached(pa, False, root="/d",
                                        cache_dir=cache)) == len(a) == 3
        assert len(load_manifest_cached(pb, False, root="/d",
                                        cache_dir=cache)) == len(b) == 5

    def test_stale_detection(self, tmp_path):
        import os

        from back2future_tpu.data import load_manifest_cached

        p = self._write(tmp_path, n=4)
        cache = tmp_path / "cache"
        first = load_manifest_cached(p, False, root="/d", cache_dir=cache)
        assert len(first) == 4
        self._write(tmp_path, n=6)
        os.utime(p, (1, 1))  # force a different mtime
        second = load_manifest_cached(p, False, root="/d", cache_dir=cache)
        assert len(second) == 6

    def test_key_includes_parse_params(self, tmp_path):
        from back2future_tpu.data import load_manifest_cached

        p = self._write(tmp_path)
        cache = tmp_path / "cache"
        a = load_manifest_cached(p, False, root="/rootA", cache_dir=cache)
        b = load_manifest_cached(p, False, root="/rootB", cache_dir=cache)
        assert a[0].image_pattern.startswith("/rootA")
        assert b[0].image_pattern.startswith("/rootB")

    def test_env_disable(self, tmp_path, monkeypatch):
        from back2future_tpu.data import load_manifest_cached

        monkeypatch.setenv("B2F_MANIFEST_CACHE", "0")
        p = self._write(tmp_path)
        cache = tmp_path / "cache"
        load_manifest_cached(p, False, root="/d", cache_dir=cache)
        assert not cache.exists()


class TestRoamingGenerator:
    """tools/make_roaming.py — the RoamingImages-style synthetic set must
    carry SELF-CONSISTENT ground truth: warping the next frame back by
    the gt flow reproduces the reference frame wherever the z-buffer
    occlusion map says 'visible', and the dataset loads through the
    standard manifest/FlowDataset path."""

    @pytest.fixture(scope="class")
    def roaming(self, tmp_path_factory):
        import importlib.util
        from pathlib import Path

        spec = importlib.util.spec_from_file_location(
            "make_roaming",
            Path(__file__).resolve().parent.parent / "tools" /
            "make_roaming.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        root = tmp_path_factory.mktemp("roaming")
        mod.main(["--out", str(root), "--n", "3", "--height", "64",
                  "--width", "96", "--frames", "3", "--layers", "2",
                  "--max_speed", "5", "--val_fraction", "0.34"])
        return root

    def _warp(self, img, flow):
        h, w = img.shape[:2]
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
        ty = ys + flow[..., 1]
        tx = xs + flow[..., 0]
        inside = (ty >= 0) & (ty <= h - 1) & (tx >= 0) & (tx <= w - 1)
        y0 = np.clip(np.floor(ty).astype(int), 0, h - 2)
        x0 = np.clip(np.floor(tx).astype(int), 0, w - 2)
        wy = np.clip(ty - y0, 0, 1)[..., None]
        wx = np.clip(tx - x0, 0, 1)[..., None]
        out = ((1 - wy) * ((1 - wx) * img[y0, x0] + wx * img[y0, x0 + 1])
               + wy * ((1 - wx) * img[y0 + 1, x0] + wx * img[y0 + 1, x0 + 1]))
        return out, inside

    def test_ground_truth_is_self_consistent(self, roaming):
        from back2future_tpu.data import load_manifest
        from back2future_tpu.io.flow_io import load_disp, load_flo

        specs = load_manifest(roaming / "datasets" / "RoamingImages.dat",
                              ground_truth=True, root=str(roaming / "data"))
        assert len(specs) == 3
        for spec in specs:
            imgs = [read_png_f32(p) for p in spec.image_paths(3)]
            flow = load_flo(spec.flow_path())
            occ = load_disp(spec.occ_paths(3)[1])
            assert set(np.unique(occ)) <= {0.0, 0.5, 1.0}
            warped, inside = self._warp(imgs[2], flow)
            visible = (occ == 0.5) & inside
            assert visible.mean() > 0.5  # most of the frame is visible
            err = np.abs(warped - imgs[1])[visible].mean()
            assert err < 0.02, f"brightness constancy violated: {err}"
            # the backward direction under linear motion: ref-1 at x-u
            warped_b, inside_b = self._warp(imgs[0], -flow)
            err_b = np.abs(warped_b - imgs[1])[(occ == 0.5) & inside_b].mean()
            assert err_b < 0.02, f"backward constancy violated: {err_b}"

    def test_loads_through_flow_dataset(self, roaming):
        from back2future_tpu.data import (FlowDataset, SampleConfig,
                                          load_manifest, load_split)

        specs = load_manifest(roaming / "datasets" / "RoamingImages.dat",
                              ground_truth=True, root=str(roaming / "data"))
        tr, va = load_split(roaming / "datasets" /
                            "RoamingImages_split.dat")
        assert len(tr) + len(va) == 3
        cfg = SampleConfig(frames=3, ground_truth=True, fine_height=32,
                           fine_width=64, load_height=64, load_width=96,
                           augment=0)
        ds = FlowDataset(specs, cfg, np.arange(3), train=True)
        images, flow_occ, mask = ds.load(0, np.random.default_rng(0))
        assert images.shape[-1] == 9
        assert flow_occ.shape[-1] == 4  # flow(2) + occ(2)
        assert np.isfinite(flow_occ).all() and np.isfinite(mask).all()


def read_png_f32(path):
    from back2future_tpu.io.png16 import read_png

    img = read_png(str(path))
    return img.astype(np.float64) / (65535.0 if img.dtype == np.uint16
                                     else 255.0)
