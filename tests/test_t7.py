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
