"""Torch7 serialization + checkpoint conversion tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from back2future_tpu.io.t7 import load_t7, save_t7
from back2future_tpu.models.convert import (assign_params, collect_convs,
                                            convert_t7_checkpoint)
from back2future_tpu.models.pwc import PWCConfig, PWCNet


class TestT7Serialization:
    def test_scalar_roundtrip(self, tmp_path):
        p = tmp_path / "x.t7"
        for v in (None, True, False, 3, 2.5, "hello"):
            save_t7(p, v)
            assert load_t7(p) == v

    def test_tensor_roundtrip(self, tmp_path):
        p = tmp_path / "t.t7"
        for dt in (np.float32, np.float64, np.int32, np.int64, np.uint8):
            arr = (np.arange(24).reshape(2, 3, 4) % 7).astype(dt)
            save_t7(p, arr)
            back = load_t7(p)
            assert back.dtype == dt
            np.testing.assert_array_equal(back, arr)

    def test_table_roundtrip(self, tmp_path):
        p = tmp_path / "tb.t7"
        obj = {"a": 1, "b": [1.5, "x", None], "c": {"d": True}}
        save_t7(p, obj)
        assert load_t7(p) == obj

    def test_list_table(self, tmp_path):
        p = tmp_path / "l.t7"
        save_t7(p, [10, 20, 30])
        assert load_t7(p) == [10, 20, 30]

    def test_shared_reference(self, tmp_path):
        """Heap ids: the same object serialized twice deserializes shared."""
        p = tmp_path / "s.t7"
        w = np.ones((2, 2), np.float32)
        mod = {"torch_type": "nn.Linear", "weight": w}
        save_t7(p, [mod, mod])
        back = load_t7(p)
        assert back[0] is back[1]

    def test_torch_class(self, tmp_path):
        p = tmp_path / "c.t7"
        obj = {"torch_type": "nn.SpatialConvolution",
               "weight": np.zeros((4, 3, 3, 3), np.float32),
               "bias": np.zeros((4,), np.float32),
               "nInputPlane": 3, "nOutputPlane": 4}
        save_t7(p, obj)
        back = load_t7(p)
        assert back["torch_type"] == "nn.SpatialConvolution"
        assert back["weight"].shape == (4, 3, 3, 3)
        assert back["nInputPlane"] == 3


def _conv_module(kernel_hwio: np.ndarray, bias: np.ndarray) -> dict:
    """flax HWIO kernel -> torch-layout conv module dict."""
    w = np.ascontiguousarray(np.transpose(kernel_hwio, (3, 2, 0, 1)))
    return {"torch_type": "nn.SpatialConvolution",
            "weight": w.astype(np.float32),
            "bias": np.asarray(bias, np.float32),
            "nInputPlane": w.shape[1], "nOutputPlane": w.shape[0]}


def _reference_style_t7(params, frames=3, levels=7, skip=2, past_flow=False):
    """Serialize flax params as a reference-ordered nngraph-like model:
    pyramid convs (+ siamese clone copies), then per level coarsest->finest
    occ decoder then flow decoder(s)."""
    mods = []
    pyramid = []
    for l in range(2, levels + 1):
        for c in ("c0", "c1"):
            conv = params[f"feat_{l}"][c]["conv"]
            pyramid.append(_conv_module(np.asarray(conv["kernel"]),
                                        np.asarray(conv["bias"])))
    mods += pyramid
    # clone copies for frames 2..F (value-identical, fresh objects)
    for _ in range(frames - 1):
        for m in pyramid:
            mods.append({**m, "weight": m["weight"].copy(),
                         "bias": m["bias"].copy()})

    def decoder_mods(d):
        out = []
        for i in range(5):
            conv = d[f"c{i}"]["conv"]
            out.append(_conv_module(np.asarray(conv["kernel"]),
                                    np.asarray(conv["bias"])))
        conv = d["out"]["conv"]
        out.append(_conv_module(np.asarray(conv["kernel"]),
                                np.asarray(conv["bias"])))
        return out

    l_st = max(skip + 1, 1)
    for l in range(levels, l_st - 1, -1):
        if frames > 2:
            mods += decoder_mods(params[f"occ_decoder_{l}"])
        mods += decoder_mods(params[f"flow_decoder_{l}"])
        if past_flow:
            mods += decoder_mods(params[f"past_decoder_{l}"])

    return {"torch_type": "nn.gModule", "modules": mods}


class TestConversion:
    @pytest.mark.parametrize("past_flow", [False, True])
    def test_roundtrip_through_t7(self, tmp_path, past_flow):
        cfg = PWCConfig(frames=3, levels=5, past_flow=past_flow)
        model = PWCNet(cfg)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 32, 64, 9)))["params"]
        t7 = _reference_style_t7(params, frames=3, levels=5,
                                 past_flow=past_flow)
        path = tmp_path / "m.t7"
        save_t7(path, t7)

        out = convert_t7_checkpoint(str(path), frames=3, levels=5,
                                    past_flow=past_flow)
        flat_a = jax.tree_util.tree_leaves_with_path(params)
        flat_b = dict(jax.tree_util.tree_leaves_with_path(out))
        assert len(flat_a) == len(flat_b)
        for path_k, leaf in flat_a:
            np.testing.assert_array_equal(
                np.asarray(leaf), np.asarray(flat_b[path_k]),
                err_msg=str(path_k))

    def test_clone_dedup(self, tmp_path):
        cfg = PWCConfig(frames=5, levels=5)
        model = PWCNet(cfg)
        params = model.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, 32, 64, 15)))["params"]
        t7 = _reference_style_t7(params, frames=5, levels=5)
        path = tmp_path / "m5.t7"
        save_t7(path, t7)
        out = convert_t7_checkpoint(str(path), frames=5, levels=5)
        conv = out["feat_2"]["c0"]["conv"]["kernel"]
        np.testing.assert_array_equal(
            np.asarray(conv), np.asarray(params["feat_2"]["c0"]["conv"]["kernel"]))

    def test_count_mismatch_raises(self, tmp_path):
        path = tmp_path / "bad.t7"
        save_t7(path, {"torch_type": "nn.gModule", "modules": [
            _conv_module(np.zeros((3, 3, 3, 16), np.float32),
                         np.zeros(16, np.float32))]})
        with pytest.raises(ValueError, match="conv count mismatch"):
            convert_t7_checkpoint(str(path), frames=3, levels=5)

    def test_dataparalleltable_unwrap(self, tmp_path):
        cfg = PWCConfig(frames=3, levels=5)
        model = PWCNet(cfg)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 32, 64, 9)))["params"]
        inner = _reference_style_t7(params, frames=3, levels=5)
        dpt = {"torch_type": "nn.DataParallelTable", "modules": [inner]}
        path = tmp_path / "dpt.t7"
        save_t7(path, dpt)
        out = convert_t7_checkpoint(str(path), frames=3, levels=5)
        np.testing.assert_array_equal(
            np.asarray(out["flow_decoder_5"]["out"]["conv"]["kernel"]),
            np.asarray(params["flow_decoder_5"]["out"]["conv"]["kernel"]))


class TestRealistic:
    """Converter vs faithfully-structured nngraph serializations
    (tests/nngraph_fixture.py): gModule forwardnodes graphs with cyclic
    node references, nn.DataParallelTable wrappers, CudaTensor dtypes,
    clone-shared storages, getParameters()-flattened single-storage
    views, SpatialConvolutionMM folded weights — the shapes the real
    Dropbox checkpoints carry (back2future.lua:113-116,
    models/pwc.lua:187-195, util.lua:50-78)."""

    def _params(self, past_flow=False, frames=3, levels=5, seed=0):
        cfg = PWCConfig(frames=frames, levels=levels, past_flow=past_flow)
        model = PWCNet(cfg)
        return model.init(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, 32, 64, 3 * frames)))["params"]

    def _assert_tree_equal(self, params, out):
        flat_a = jax.tree_util.tree_leaves_with_path(params)
        flat_b = dict(jax.tree_util.tree_leaves_with_path(out))
        assert len(flat_a) == len(flat_b)
        for path_k, leaf in flat_a:
            np.testing.assert_array_equal(
                np.asarray(leaf), np.asarray(flat_b[path_k]),
                err_msg=str(path_k))

    @pytest.mark.parametrize("past_flow", [False, True])
    def test_gmodule_forwardnodes_cuda(self, tmp_path, past_flow):
        from nngraph_fixture import build_gmodule, save_nngraph_t7

        params = self._params(past_flow)
        gm = build_gmodule(params, frames=3, levels=5, past_flow=past_flow)
        path = tmp_path / "gm.t7"
        save_nngraph_t7(path, gm)
        out = convert_t7_checkpoint(str(path), frames=3, levels=5,
                                    past_flow=past_flow)
        self._assert_tree_equal(params, out)

    def test_forwardnodes_only_no_modules_key(self, tmp_path):
        """Conversion must survive a gModule whose flat `modules` list is
        absent — the walk then has to follow the forwardnodes graph."""
        from nngraph_fixture import build_gmodule, save_nngraph_t7

        params = self._params()
        gm = build_gmodule(params, frames=3, levels=5,
                           include_modules_key=False)
        path = tmp_path / "fn.t7"
        save_nngraph_t7(path, gm)
        out = convert_t7_checkpoint(str(path), frames=3, levels=5)
        self._assert_tree_equal(params, out)

    def test_dpt_wrapped_flattened_storage(self, tmp_path):
        """DataParallelTable wrapper + every weight a view into one flat
        storage (the post-getParameters() layout) + storage-shared
        siamese clones."""
        from nngraph_fixture import (build_gmodule, save_nngraph_t7,
                                     wrap_dpt)

        params = self._params(frames=5, levels=5, seed=3)
        gm = build_gmodule(params, frames=5, levels=5,
                           flatten_storage=True)
        path = tmp_path / "dpt_flat.t7"
        save_nngraph_t7(path, wrap_dpt(gm))
        out = convert_t7_checkpoint(str(path), frames=5, levels=5)
        self._assert_tree_equal(params, out)

    def test_spatialconvolutionmm_folded(self, tmp_path):
        """nn.SpatialConvolutionMM stores weights 2-D (outC, inC*kH*kW);
        the converter unfolds them via the kH/kW/nInputPlane attrs."""
        from nngraph_fixture import build_gmodule, save_nngraph_t7

        params = self._params()
        gm = build_gmodule(params, frames=3, levels=5,
                           conv_type="nn.SpatialConvolutionMM",
                           mm_folded=True)
        path = tmp_path / "mm.t7"
        save_nngraph_t7(path, gm)
        out = convert_t7_checkpoint(str(path), frames=3, levels=5)
        self._assert_tree_equal(params, out)

    def test_strided_and_offset_views_load_exactly(self, tmp_path):
        """The reader must materialize non-contiguous / offset tensor
        views exactly (transposed strides, nonzero storage offset,
        shared storage)."""
        from nngraph_fixture import TV, save_nngraph_t7

        storage = np.arange(64, dtype=np.float32)
        obj = {
            "plain": TV(storage, (4, 4), (4, 1), 0),
            "offset": TV(storage, (3, 4), (4, 1), 8),
            "transposed": TV(storage, (4, 4), (1, 4), 0),
            "strided_rows": TV(storage, (4, 4), (8, 1), 0),
        }
        path = tmp_path / "views.t7"
        save_nngraph_t7(path, obj)
        back = load_t7(str(path))
        base = storage.reshape(8, 8)
        np.testing.assert_array_equal(back["plain"],
                                      storage[:16].reshape(4, 4))
        np.testing.assert_array_equal(back["offset"],
                                      storage[8:20].reshape(3, 4))
        np.testing.assert_array_equal(back["transposed"],
                                      storage[:16].reshape(4, 4).T)
        np.testing.assert_array_equal(back["strided_rows"], base[:4, :4])

    def test_parity_harness_on_realistic_t7(self, tmp_path):
        """tools/parity.py --t7 runs unchanged on a realistic
        serialization: converts, runs compute_flow on a triplet, writes
        flow artifacts, and the flow equals a direct forward with the
        source params."""
        import sys
        from pathlib import Path as _P

        sys.path.insert(0, str(_P(__file__).resolve().parent.parent
                               / "tools"))
        import parity

        from nngraph_fixture import build_gmodule, save_nngraph_t7, wrap_dpt
        from back2future_tpu.io.flow_io import load_flo
        from back2future_tpu.io.png16 import write_png

        params = self._params(levels=5)
        gm = build_gmodule(params, frames=3, levels=5)
        t7_path = tmp_path / "real.t7"
        save_nngraph_t7(t7_path, wrap_dpt(gm))

        rng = np.random.default_rng(0)
        frame_paths = []
        for i in range(3):
            p = tmp_path / f"f{i}.png"
            write_png(p, (rng.random((48, 80, 3)) * 255).astype(np.uint8))
            frame_paths.append(str(p))

        rc = parity.main([
            "--t7", str(t7_path), "--frames", *frame_paths,
            "--levels", "5", "--out", str(tmp_path / "out"), "--cpu"])
        assert rc == 0
        flo = load_flo(tmp_path / "out" / "flow.flo")
        assert flo.shape[-1] == 2 and np.isfinite(flo).all()

        # same flow as running the source params directly
        from back2future_tpu.models.pwc import pwc_config_from_options
        from back2future_tpu.config import Options

        opt = Options(frames=3, levels=5).derive()
        flow2, _, _ = parity.run_triplet(
            (params, pwc_config_from_options(opt)), frame_paths)
        np.testing.assert_allclose(flo, np.asarray(flow2), rtol=1e-5,
                                   atol=1e-6)
