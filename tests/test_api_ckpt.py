"""Inference API, checkpoint/resume, and logger tests."""

import dataclasses
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from back2future_tpu.api import FlowEstimator, init, _round_down_64
from back2future_tpu.config import Options
from back2future_tpu.models.pwc import PWCConfig, PWCNet, pwc_config_from_options
from back2future_tpu.train.checkpoint import (
    latest_checkpoint, load_model_checkpoint, load_or_convert,
    load_train_checkpoint, save_checkpoint, wait_for_saves)
from back2future_tpu.train.state import create_train_state
from back2future_tpu.utils import SymbolLogger


def small_opt(**kw) -> Options:
    base = dict(levels=5, frames=3, compute_dtype="float32",
                cropHeight=32, cropWidth=64, cache="", expName="")
    base.update(kw)
    return Options(**base).derive()


def small_model_and_params(opt, seed=0):
    cfg = pwc_config_from_options(opt)
    model = PWCNet(cfg)
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, 32, 64, 3 * opt.frames)))["params"]
    return model, cfg, params


class TestApi:
    def test_round_down_64(self):
        assert _round_down_64(1242) == 1216
        assert _round_down_64(375) == 320
        assert _round_down_64(64) == 64
        assert _round_down_64(40) == 64  # floor at one tile

    def test_compute_flow_shapes(self):
        opt = small_opt()
        _, cfg, params = small_model_and_params(opt)
        cf = init((params, cfg), dtype="float32")
        rng = np.random.default_rng(0)
        ims = [rng.random((96, 130, 3)).astype(np.float32) for _ in range(3)]
        flow, fwd_occ, bwd_occ = cf(*ims)
        assert flow.shape == (96, 130, 2)
        assert fwd_occ.shape == (96, 130) and fwd_occ.dtype == bool
        assert bwd_occ.shape == (96, 130)
        assert np.isfinite(flow).all()

    def test_component_rescaling(self):
        """u is scaled by W/W64 and v by H/H64 (back2future.lua:77-84)."""
        opt = small_opt()
        _, cfg, params = small_model_and_params(opt)
        est = FlowEstimator(params, cfg, dtype="float32")
        rng = np.random.default_rng(0)
        # exact /64 input: no resizing at all
        ims = [rng.random((64, 128, 3)).astype(np.float32) for _ in range(3)]
        flow, _, _ = est(*ims)
        ims2 = [np.asarray(
            np.kron(im, np.ones((2, 2, 1), np.float32)), np.float32)
            for im in ims]  # 128x256: still /64, doubled
        flow2, _, _ = est(*ims2)
        assert flow2.shape == (128, 256, 2)

    def test_wrong_frame_count_raises(self):
        opt = small_opt()
        _, cfg, params = small_model_and_params(opt)
        est = FlowEstimator(params, cfg, dtype="float32")
        im = np.zeros((64, 64, 3), np.float32)
        with pytest.raises(ValueError, match="frames"):
            est(im, im, np.zeros((64, 64, 6), np.float32))

    def test_missing_checkpoint_raises(self):
        with pytest.raises(FileNotFoundError, match="convert"):
            init("Ours-Hard")


class TestCheckpoint:
    def test_spynet_checkpoint_roundtrip_but_api_rejects(self, tmp_path):
        """SPyNet checkpoints save/resume for training; the serving API
        rejects them with a clear error (it serves PWC only, matching
        computeFlow back2future.lua:97-129)."""
        from back2future_tpu.api import init
        from back2future_tpu.models.spynet import (SPyNet,
                                                   spynet_config_from_options)

        opt = small_opt(netType="spynet", levels=3)
        cfg = spynet_config_from_options(opt)
        params = SPyNet(cfg).init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 16, 32, 3 * opt.frames)))["params"]
        state = create_train_state(params, opt, epoch=1)
        mp, _ = save_checkpoint(tmp_path, state, opt, epoch=1)

        params2, cfg2 = load_model_checkpoint(mp)  # sidecar-driven netType
        assert type(cfg2).__name__ == "SPyNetConfig"
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(params2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        with pytest.raises(ValueError, match="PWC family"):
            init(str(mp))

    def test_convert_to_soft_guards(self, tmp_path):
        """Misconfigured hard->soft conversions fail with clear errors
        (not deep tree-surgery KeyErrors), and independently of -O.
        The CLI layer can't reach the netType case (derive() clears
        convert_to_soft for non-pwc, opts.lua:150-154) — that branch
        guards programmatic Options construction."""
        opt = small_opt(retrain=str(tmp_path / "x.msgpack"),
                        convert_to_soft=True, past_flow=False)
        with pytest.raises(ValueError, match="past_flow"):
            load_or_convert(opt)
        opt = dataclasses.replace(
            small_opt(netType="spynet", levels=3,
                      retrain=str(tmp_path / "x.msgpack")),
            convert_to_soft=True, past_flow=True)  # bypasses derive()
        with pytest.raises(ValueError, match="PWC recipe"):
            load_or_convert(opt)

    def test_save_load_roundtrip(self, tmp_path):
        opt = small_opt()
        _, cfg, params = small_model_and_params(opt)
        state = create_train_state(params, opt, epoch=3)
        mp, op = save_checkpoint(tmp_path, state, opt, epoch=3)
        assert mp.name == "model_3.msgpack" and op.name == "optimState_3.msgpack"

        params2, cfg2 = load_model_checkpoint(mp, opt)
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(params2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        state2, next_epoch = load_train_checkpoint(tmp_path, opt)
        assert next_epoch == 4
        np.testing.assert_array_equal(np.asarray(state2.step),
                                      np.asarray(state.step))

    def test_latest_scan(self, tmp_path):
        opt = small_opt()
        _, _, params = small_model_and_params(opt)
        state = create_train_state(params, opt)
        for e in (1, 5, 12):
            save_checkpoint(tmp_path, state, opt, epoch=e)
        p, e = latest_checkpoint(tmp_path)
        assert e == 12 and p.name == "model_12.msgpack"
        assert latest_checkpoint(tmp_path / "nope") == (None, 0)

    def test_options_sidecar_restores_config(self, tmp_path):
        opt = small_opt()
        _, cfg, params = small_model_and_params(opt)
        state = create_train_state(params, opt)
        save_checkpoint(tmp_path, state, opt, epoch=1)
        _, cfg2 = load_model_checkpoint(tmp_path)  # directory form, no opt
        assert cfg2.levels == cfg.levels and cfg2.frames == cfg.frames

    def test_cont_resume_path(self, tmp_path):
        opt = dataclasses.replace(small_opt(), cont=True,
                                  save=str(tmp_path))
        _, _, params = small_model_and_params(opt)
        state = create_train_state(params, opt)
        save_checkpoint(tmp_path, state, opt, epoch=7)
        params2, _cfg, epoch0 = load_or_convert(opt)
        assert epoch0 == 8
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(params2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_convert_to_soft_via_retrain(self, tmp_path):
        hard_opt = small_opt()
        _, _, hard_params = small_model_and_params(hard_opt)
        state = create_train_state(hard_params, hard_opt)
        save_checkpoint(tmp_path, state, hard_opt, epoch=2)

        soft_opt = dataclasses.replace(
            small_opt(past_flow=True), retrain=str(tmp_path),
            convert_to_soft=True)
        params, cfg, _ = load_or_convert(soft_opt)
        assert cfg.past_flow
        # future-flow decoders carry the hard weights verbatim
        for l in range(cfg.l_st, cfg.levels + 1):
            a = hard_params[f"flow_decoder_{l}"]
            b = params[f"flow_decoder_{l}"]
            for x, y in zip(jax.tree_util.tree_leaves(a),
                            jax.tree_util.tree_leaves(b)):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
            assert f"past_decoder_{l}" in params


class TestLogger:
    def test_tsv_roundtrip(self, tmp_path):
        log = SymbolLogger(tmp_path / "train.log")
        log.add({"avg loss (train set)": 1.5, "avg epe (train set)": 3.25})
        log.add({"avg loss (train set)": 1.25, "avg epe (train set)": 3.0})
        cols = log.read()
        assert cols["avg loss (train set)"] == [1.5, 1.25]
        assert cols["avg epe (train set)"] == [3.25, 3.0]

    def test_reference_byte_format(self, tmp_path):
        """Rows use %11.4e with a trailing tab per column
        (myLogger.lua:74-79,98-106) — byte-compatible with reference
        train.log consumers."""
        log = SymbolLogger(tmp_path / "t.log")
        log.add({"a": 1.5, "b": -0.25})
        header, row = (tmp_path / "t.log").read_text().splitlines()
        assert header == "a\tb\t"
        assert row == " 1.5000e+00\t-2.5000e-01\t"

    def test_reads_lua_written_log(self, tmp_path):
        """A log written by the reference (trailing tabs) parses and
        appends cleanly."""
        (tmp_path / "lua.log").write_text(
            "loss\tepe\t\n 1.0000e+00\t 2.0000e+00\t\n")
        log = SymbolLogger(tmp_path / "lua.log")
        log.add({"loss": 3.0, "epe": 4.0})
        cols = log.read()
        assert cols["loss"] == [1.0, 3.0]
        assert cols["epe"] == [2.0, 4.0]

    def test_reopen_appends(self, tmp_path):
        SymbolLogger(tmp_path / "t.log").add({"a": 1.0})
        log2 = SymbolLogger(tmp_path / "t.log")
        log2.add({"a": 2.0})
        assert log2.read()["a"] == [1.0, 2.0]

    def test_unknown_symbol_raises(self, tmp_path):
        log = SymbolLogger(tmp_path / "t.log")
        log.add({"a": 1.0})
        with pytest.raises(ValueError, match="unknown log symbols"):
            log.add({"b": 2.0})


class TestOrbaxBackend:
    def test_orbax_roundtrip(self, tmp_path):
        pytest.importorskip("orbax.checkpoint")
        opt = small_opt()
        _, cfg, params = small_model_and_params(opt)
        state = create_train_state(params, opt, epoch=2)
        mp, op = save_checkpoint(tmp_path, state, opt, epoch=2,
                                 backend="orbax")
        wait_for_saves()  # orbax saves are async (train.lua:179-185 analog)
        assert mp.name == "model_2.orbax" and mp.is_dir()

        params2, cfg2 = load_model_checkpoint(mp, opt)
        for a, b in zip(jax.tree_util.tree_leaves(params),
                        jax.tree_util.tree_leaves(params2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert cfg2.levels == cfg.levels

        state2, next_epoch = load_train_checkpoint(tmp_path, opt)
        assert next_epoch == 3
        np.testing.assert_array_equal(np.asarray(state2.step),
                                      np.asarray(state.step))

    def test_latest_scan_mixed_backends(self, tmp_path):
        pytest.importorskip("orbax.checkpoint")
        opt = small_opt()
        _, _, params = small_model_and_params(opt)
        state = create_train_state(params, opt)
        save_checkpoint(tmp_path, state, opt, epoch=1)
        save_checkpoint(tmp_path, state, opt, epoch=4, backend="orbax")
        wait_for_saves()
        p, e = latest_checkpoint(tmp_path)
        assert e == 4 and p.suffix == ".orbax"


class TestLoggerPlot:
    def test_plot_svg(self, tmp_path):
        log = SymbolLogger(tmp_path / "train.log")
        log.style({"EPE": "+"})
        for e in range(5):
            log.add({"avg loss (train set)": 10.0 / (e + 1), "EPE": 3.0 - e * 0.2})
        out = log.plot()
        svg = out.read_text()
        assert out.suffix == ".svg"
        assert "polyline" in svg and "circle" in svg
        assert "avg loss (train set)" in svg and "EPE" in svg

    def test_plot_empty_raises(self, tmp_path):
        log = SymbolLogger(tmp_path / "x.log")
        log.add({"a": 1.0})
        (tmp_path / "x.log").write_text("a\n")
        with pytest.raises((ValueError, FileNotFoundError)):
            SymbolLogger(tmp_path / "empty.log").plot()


class TestShapeBuckets:
    """/64-grid shape-bucket policy: same-bucket inputs share one
    compiled executable silently; a second bucket warns about the fresh
    compile; warmup() pre-registers buckets so later calls don't warn."""

    def _cf(self):
        opt = small_opt()
        _, cfg, params = small_model_and_params(opt)
        return init((params, cfg), dtype="float32")

    def test_same_bucket_no_warning(self):
        import warnings

        cf = self._cf()
        rng = np.random.default_rng(0)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            for w in (130, 140, 180):  # all snap to the same 64x128 grid
                ims = [rng.random((96, w, 3)).astype(np.float32)
                       for _ in range(3)]
                cf(*ims)

    def test_new_bucket_warns_once(self):
        cf = self._cf()
        rng = np.random.default_rng(0)
        ims = [rng.random((96, 130, 3)).astype(np.float32)
               for _ in range(3)]
        cf(*ims)
        with pytest.warns(UserWarning, match="shape bucket"):
            ims2 = [rng.random((96, 200, 3)).astype(np.float32)
                    for _ in range(3)]
            cf(*ims2)

    def test_warmup_precompiles(self):
        import warnings

        cf = self._cf()
        cf.warmup([(96, 130), (96, 200)])
        rng = np.random.default_rng(0)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            for w in (130, 200):
                ims = [rng.random((96, w, 3)).astype(np.float32)
                       for _ in range(3)]
                cf(*ims)

    def test_batch_size_is_a_bucket(self):
        """jit specializes on batch size too: a new batch size at a known
        resolution is a new executable and must warn; warming the
        (batch, h, w) combination silences it."""
        import warnings

        cf = self._cf()
        rng = np.random.default_rng(0)
        one = [rng.random((96, 130, 3)).astype(np.float32)
               for _ in range(3)]
        cf(*one)
        with pytest.warns(UserWarning, match="shape bucket"):
            two = [np.stack([im, im]) for im in one]
            cf.compute_flow_batch(*two)

        cf2 = self._cf()
        cf2.warmup([(1, 96, 130), (2, 96, 130)])
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            cf2(*one)
            cf2.compute_flow_batch(*[np.stack([im, im]) for im in one])


class TestServingDtype:
    def test_override_and_default(self):
        opt = small_opt()  # float32 compute dtype
        _, cfg, params = small_model_and_params(opt)
        assert init((params, cfg)).config.dtype == cfg.dtype  # honored
        est = init((params, cfg), dtype="bfloat16")
        assert est.config.dtype == jnp.bfloat16
        rng = np.random.default_rng(0)
        ims = [rng.random((96, 130, 3)).astype(np.float32)
               for _ in range(3)]
        flow, _, _ = est(*ims)  # bf16 forward still serves f32 results
        assert flow.dtype == np.float32 and np.isfinite(flow).all()


class TestVariableFrameServing:
    """The API serves any model frame count (one image per frame), not
    just the flagship F=3 — the model family is F in {2, odd}."""

    def test_two_frame_model(self):
        opt = small_opt(frames=2)
        _, cfg, params = small_model_and_params(opt)
        cf = init((params, cfg), dtype="float32")
        rng = np.random.default_rng(0)
        ims = [rng.random((96, 130, 3)).astype(np.float32)
               for _ in range(2)]
        flow, fwd, bwd = cf(*ims)
        assert flow.shape == (96, 130, 2)

    def test_wrong_frame_count_raises(self):
        opt = small_opt()
        _, cfg, params = small_model_and_params(opt)
        cf = init((params, cfg), dtype="float32")
        rng = np.random.default_rng(0)
        ims = [rng.random((96, 130, 3)).astype(np.float32)
               for _ in range(2)]
        with pytest.raises(ValueError, match="expects 3 frames"):
            cf(*ims)


class TestExport:
    """AOT serving artifact: FlowEstimator.export() -> load_exported()
    must reproduce the live estimator bit-for-bit on exported buckets,
    with no model code or params in the serving path."""

    def _pair(self, tmp_path):
        opt = small_opt()
        _, cfg, params = small_model_and_params(opt)
        cf = init((params, cfg), dtype="float32")
        cf.export(tmp_path / "art", [(96, 130), (2, 96, 130)])
        from back2future_tpu.api import load_exported

        return cf, load_exported(tmp_path / "art")

    def test_roundtrip_matches_live(self, tmp_path):
        cf, served = self._pair(tmp_path)
        rng = np.random.default_rng(0)
        ims = [rng.random((96, 130, 3)).astype(np.float32)
               for _ in range(3)]
        flow_a, fwd_a, bwd_a = cf(*ims)
        flow_b, fwd_b, bwd_b = served(*ims)
        np.testing.assert_array_equal(flow_a, flow_b)
        np.testing.assert_array_equal(fwd_a, fwd_b)
        np.testing.assert_array_equal(bwd_a, bwd_b)
        # batched bucket too
        two = [np.stack([im, im]) for im in ims]
        fa, _, _ = cf.compute_flow_batch(*two)
        fb, _, _ = served.compute_flow_batch(*two)
        np.testing.assert_array_equal(fa, fb)

    def test_unseen_bucket_raises(self, tmp_path):
        _, served = self._pair(tmp_path)
        rng = np.random.default_rng(0)
        ims = [rng.random((96, 200, 3)).astype(np.float32)
               for _ in range(3)]
        with pytest.raises(ValueError, match="no exported executable"):
            served(*ims)

    def test_fresh_process_serves_without_model_code(self, tmp_path):
        """The serving-process claim, literally: a new interpreter loads
        the artifact and computes flow without back2future_tpu.models
        ever being imported."""
        import subprocess
        import sys
        import textwrap
        from pathlib import Path

        self._pair(tmp_path)  # writes tmp_path/art
        script = textwrap.dedent(f"""
            import jax; jax.config.update("jax_platforms", "cpu")
            import sys
            import numpy as np
            sys.path.insert(0, {str(Path(__file__).parent.parent)!r})
            from back2future_tpu.api import load_exported
            served = load_exported({str(tmp_path / "art")!r})
            rng = np.random.default_rng(0)
            ims = [rng.random((96, 130, 3)).astype(np.float32)
                   for _ in range(3)]
            flow, fwd, bwd = served(*ims)
            assert flow.shape == (96, 130, 2), flow.shape
            assert np.isfinite(flow).all()
            assert "back2future_tpu.models.pwc" not in sys.modules, \\
                "serving imported the model code"
            print("served-without-model-code ok")
        """)
        out = subprocess.run([sys.executable, "-c", script, ],
                             capture_output=True, text=True, timeout=420)
        assert out.returncode == 0, out.stderr[-2000:]
        assert "served-without-model-code ok" in out.stdout

    def test_bad_artifact_rejected(self, tmp_path):
        import json

        from back2future_tpu.api import load_exported

        art = tmp_path / "bad"
        art.mkdir()
        (art / "meta.json").write_text(json.dumps({"format": "other"}))
        with pytest.raises(ValueError, match="not a back2future_tpu"):
            load_exported(art)

    def test_platform_mismatch_rejected_at_load(self, tmp_path):
        """The docstring's 'platform-checked at load' contract: an
        artifact exported under another backend refuses to load, not
        fail deep inside the first fn.call."""
        import json

        from back2future_tpu.api import load_exported

        self._pair(tmp_path)  # writes tmp_path/art (platforms=["cpu"])
        meta_path = tmp_path / "art" / "meta.json"
        meta = json.loads(meta_path.read_text())
        meta["platforms"] = ["tpu"]
        meta_path.write_text(json.dumps(meta))
        with pytest.raises(ValueError, match="exported for platform"):
            load_exported(tmp_path / "art")

    def test_bad_dtype_override_rejected(self):
        opt = small_opt()
        _, cfg, params = small_model_and_params(opt)
        with pytest.raises(ValueError, match="serving dtype"):
            FlowEstimator(params, cfg, dtype="fp32")

    def test_mesh_estimator_not_exportable(self, tmp_path):
        from back2future_tpu.parallel import make_mesh

        opt = small_opt()
        _, cfg, params = small_model_and_params(opt)
        cf = init((params, cfg), dtype="float32",
                  mesh=make_mesh(jax.devices()[:2]))
        with pytest.raises(ValueError, match="single-device"):
            cf.export(tmp_path / "art", [(96, 130)])


class TestCompileCache:
    """Persistent-XLA-cache helper (utils/compile_cache.py): verified on
    hardware that serialized executables round-trip through the TPU
    relay (fresh-process cache hit, ~1 ms vs minutes); here we check the
    helper's wiring hermetically on CPU."""

    def test_enable_creates_dir_and_populates(self, tmp_path):
        from back2future_tpu.utils import enable_compile_cache

        cache = tmp_path / "xla"
        old = jax.config.jax_compilation_cache_dir
        old_sz = jax.config.jax_persistent_cache_min_entry_size_bytes
        old_t = jax.config.jax_persistent_cache_min_compile_time_secs
        try:
            # force caching of even a trivial executable
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
            got = enable_compile_cache(cache)
            assert got == str(cache) and cache.is_dir()
            # unique constant so this HLO can't already sit in the
            # session's in-memory executable cache (which would skip
            # the persistent write)
            salt = float(abs(hash(str(tmp_path))) % 100000)
            f = jax.jit(lambda x: x * 2.0 + salt)
            np.testing.assert_allclose(
                np.asarray(f(jnp.ones((4, 4)))), 2.0 + salt)
            assert list(cache.iterdir()), "no cache entry written"
        finally:
            jax.config.update("jax_compilation_cache_dir", old)
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", old_sz)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", old_t)

    def test_disable_via_env(self, monkeypatch, tmp_path):
        from back2future_tpu.utils import enable_compile_cache

        monkeypatch.setenv("B2F_COMPILE_CACHE", "0")
        assert enable_compile_cache(tmp_path / "nope") is None
        assert not (tmp_path / "nope").exists()

    def test_env_overrides_dir(self, monkeypatch, tmp_path):
        from back2future_tpu.utils import enable_compile_cache

        old = jax.config.jax_compilation_cache_dir
        try:
            monkeypatch.setenv("B2F_COMPILE_CACHE", str(tmp_path / "envdir"))
            got = enable_compile_cache()
            assert got == str(tmp_path / "envdir")
            assert (tmp_path / "envdir").is_dir()
        finally:
            jax.config.update("jax_compilation_cache_dir", old)


class TestServingMesh:
    """Mesh-sharded batched serving — the scale-out mode the reference's
    single-GPU computeFlow (back2future.lua:47-95) has no analog of."""

    def _estimator(self, mesh=None, spatial=False):
        opt = small_opt()
        _, cfg, params = small_model_and_params(opt)
        return FlowEstimator(params, cfg, dtype="float32",
                             mesh=mesh, spatial=spatial)

    def _triplets(self, b, h=64, w=128, seed=1):
        rng = np.random.default_rng(seed)
        return [rng.random((b, h, w, 3)).astype(np.float32)
                for _ in range(3)]

    def test_batch_matches_single(self):
        est = self._estimator()
        ims = self._triplets(2, h=96, w=130)  # exercises the /64 resize too
        flows, fo, bo = est.compute_flow_batch(*ims)
        assert flows.shape == (2, 96, 130, 2)
        f0, fo0, bo0 = est(ims[0][0], ims[1][0], ims[2][0])
        np.testing.assert_allclose(flows[0], f0, rtol=1e-5, atol=1e-5)
        assert (fo[0] == fo0).all() and (bo[0] == bo0).all()

    def test_list_inputs(self):
        est = self._estimator()
        ims = self._triplets(2)
        flows, _, _ = est.compute_flow_batch(
            list(ims[0]), list(ims[1]), list(ims[2]))
        ref, _, _ = est.compute_flow_batch(*ims)
        np.testing.assert_array_equal(flows, ref)

    def test_mesh_data_sharded_with_padding(self):
        from back2future_tpu.parallel.mesh import make_mesh

        ims = self._triplets(5)  # 5 % 8 != 0 -> pads to 8, trims back
        ref_est = self._estimator()
        want, wfo, wbo = ref_est.compute_flow_batch(*ims)

        mesh = make_mesh(shape=(8,), axes=("data",))
        est = self._estimator(mesh=mesh)
        got, gfo, gbo = est.compute_flow_batch(*ims)
        assert got.shape == (5, 64, 128, 2)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
        assert (gfo == wfo).all() and (gbo == wbo).all()

    def test_mesh_spatial_sharded(self):
        from back2future_tpu.parallel.mesh import make_mesh

        ims = self._triplets(4)
        ref_est = self._estimator()
        want, _, _ = ref_est.compute_flow_batch(*ims)

        mesh = make_mesh(shape=(4, 2), axes=("data", "spatial"))
        est = self._estimator(mesh=mesh, spatial=True)
        got, _, _ = est.compute_flow_batch(*ims)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_single_triplet_through_mesh(self):
        from back2future_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(shape=(8,), axes=("data",))
        est = self._estimator(mesh=mesh)
        rng = np.random.default_rng(3)
        ims = [rng.random((64, 128, 3)).astype(np.float32)
               for _ in range(3)]
        flow, fwd_occ, bwd_occ = est(*ims)
        assert flow.shape == (64, 128, 2)
        assert np.isfinite(flow).all()
