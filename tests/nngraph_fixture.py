"""Faithfully-structured nngraph serialization fixtures for t7 tests.

Mirrors the object graph of the reference's real pretrained checkpoints
(back2future.lua:113-116): an nn.DataParallelTable wrapping an nngraph
gModule whose `forwardnodes` are graph.Node torch objects with cyclic
data/children/mapindex references, CudaTensor weights, clone-shared
storages (models/pwc.lua:187-195 clones share storage with the frame-1
pyramid), getParameters()-flattened single-storage weight views, junk
gradWeight/output/gradInput buffers, and interspersed parameterless
modules (LeakyReLU/CostVolMulti/BilinearSamplerBHWD/...).

The builder deliberately does NOT reuse io.t7's canonical tensor writer:
tensors are emitted as explicit storage views (torch.CudaTensor +
torch.CudaStorage with 1-based offsets and element strides), so
storage-level sharing and non-contiguous strides appear exactly as torch
serializes them — the shapes `io/t7.py` must parse on first contact with
a real checkpoint.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from back2future_tpu.io.t7 import T7Writer, TYPE_TORCH, _deep_recursion


@dataclasses.dataclass(eq=False)
class TV:
    """A torch tensor view: (storage, shape, element-strides, 0-based
    offset). Distinct TV objects over the same storage array serialize
    as distinct Tensor heap objects sharing ONE Storage heap object —
    torch's clone/flatten sharing model."""
    storage: np.ndarray
    shape: Tuple[int, ...]
    stride: Tuple[int, ...]
    offset: int = 0
    cls: str = "torch.CudaTensor"


def tv(arr: np.ndarray, cls: str = "torch.CudaTensor") -> TV:
    a = np.ascontiguousarray(np.asarray(arr, np.float32))
    stride = tuple(s // a.itemsize for s in a.strides)
    return TV(a.reshape(-1), a.shape, stride, 0, cls)


class NNGraphWriter(T7Writer):
    """T7Writer + explicit tensor-view objects (CudaTensor/CudaStorage)."""

    def write(self, obj: Any):
        if isinstance(obj, TV):
            self._write_tv(obj)
        else:
            super().write(obj)

    def _write_tv(self, t: TV):
        self._i32(TYPE_TORCH)
        hid, seen = self._heap_id(t)
        self._i32(hid)
        if seen:
            return
        self._string("V 1")
        self._string(t.cls)
        self._i32(len(t.shape))
        for s in t.shape:
            self._i64(s)
        for s in t.stride:
            self._i64(s)
        self._i64(t.offset + 1)  # 1-based storage offset
        self._i32(TYPE_TORCH)
        sid, sseen = self._heap_id(t.storage, "storage")
        self._i32(sid)
        if not sseen:
            self._string("V 1")
            self._string(t.cls.replace("Tensor", "Storage"))
            self._i64(t.storage.size)
            self.f.write(np.ascontiguousarray(t.storage).tobytes())


def save_nngraph_t7(path, obj) -> None:
    with open(path, "wb") as f, _deep_recursion():
        NNGraphWriter(f).write(obj)


# ---------------------------------------------------------------------------
# module builders


def _junk_buffers(out_c: int) -> Dict[str, Any]:
    """Activation/grad buffers a real (un-clearState'd) module carries;
    includes a non-contiguous transposed view the reader must not trip
    on. iter_modules must skip all of these."""
    buf = np.zeros((2, out_c, 4, 4), np.float32).reshape(-1)
    return {
        "output": TV(buf, (2, out_c, 4, 4), (out_c * 16, 16, 4, 1)),
        "gradInput": TV(np.zeros(0, np.float32), (0,), (1,)),
        # transposed (non-contiguous) stride order
        "gradWeight": TV(np.zeros(out_c * 4, np.float32), (4, out_c),
                         (1, 4)),
        "gradBias": tv(np.zeros(out_c, np.float32)),
    }


def conv_module(kernel_hwio: np.ndarray, bias: np.ndarray,
                torch_type: str = "cudnn.SpatialConvolution",
                weight_tv: Optional[TV] = None,
                bias_tv: Optional[TV] = None,
                mm_folded: bool = False) -> Dict[str, Any]:
    """flax HWIO kernel -> realistically-attributed torch conv module."""
    w = np.ascontiguousarray(
        np.transpose(np.asarray(kernel_hwio, np.float32), (3, 2, 0, 1)))
    out_c, in_c, kh, kw = w.shape
    if weight_tv is None:
        weight_tv = tv(w.reshape(out_c, in_c * kh * kw) if mm_folded else w)
    if bias_tv is None:
        bias_tv = tv(np.asarray(bias, np.float32))
    m = {
        "torch_type": torch_type,
        # scrambled field order: lua pairs() serializes tables in
        # arbitrary hash order, so attribute order carries no meaning
        "padW": kw // 2, "train": False,
        "weight": weight_tv,
        "nOutputPlane": out_c, "dH": 1,
        "bias": bias_tv,
        "kW": kw, "nInputPlane": in_c, "padH": kh // 2, "dW": 1, "kH": kh,
    }
    m.update(_junk_buffers(out_c))
    return m


def clone_conv(m: Dict[str, Any]) -> Dict[str, Any]:
    """A torch :clone('weight','bias') — a NEW module object whose weight
    and bias tensors are NEW tensor objects over the SAME storages."""
    c = dict(m)
    for k in ("weight", "bias"):
        t = m[k]
        c[k] = TV(t.storage, t.shape, t.stride, t.offset, t.cls)
    c.update(_junk_buffers(m["nOutputPlane"]))
    return c


def aux_module(torch_type: str, **attrs) -> Dict[str, Any]:
    return {"torch_type": torch_type, "train": False, **attrs}


# ---------------------------------------------------------------------------
# graph builders


def make_nodes(modules: List[Optional[Dict]]) -> List[Dict]:
    """Wrap a module sequence in graph.Node objects (chained children,
    cyclic mapindex references to the parent's data table), the way
    nngraph's topo-sorted forwardnodes serialize."""
    datas, nodes = [], []
    for i, mod in enumerate(modules):
        data: Dict[str, Any] = {
            "annotations": {"_debugLabel": f"[fixture:{i}]",
                            "graphAttributes": {}},
            "forwardNodeId": i + 1, "input": [], "gradOutput": [],
            "mapindex": [],
        }
        if mod is not None:  # input/output nodes carry no module
            data["module"] = mod
        node = {"torch_type": "graph.Node", "id": i + 1, "visited": False,
                "marked": False, "children": [], "data": data}
        datas.append(data)
        nodes.append(node)
    for i in range(len(nodes) - 1):
        nodes[i]["children"] = [nodes[i + 1]]
        datas[i + 1]["mapindex"] = [datas[i]]  # cycle: child -> parent data
    return nodes


def build_gmodule(params, frames: int = 3, levels: int = 5, skip: int = 2,
                  past_flow: bool = False, include_modules_key: bool = True,
                  flatten_storage: bool = False,
                  conv_type: str = "cudnn.SpatialConvolution",
                  mm_folded: bool = False) -> Dict[str, Any]:
    """flax params -> a gModule serialization in reference construction
    order (models/pwc.lua:87-508): frame-1 pyramid convs, storage-shared
    clones for frames 2..F, then per level coarsest->finest the occ
    decoder and flow decoder(s), with parameterless ops interspersed.

    flatten_storage=True emits every weight/bias as a view into ONE flat
    storage (the post-getParameters() layout of real checkpoints)."""
    created: List[Dict] = []

    def make_conv(kernel, bias):
        m = conv_module(kernel, bias, conv_type, mm_folded=mm_folded)
        created.append(m)
        return m

    pyramid = []
    for l in range(2, levels + 1):
        for c in ("c0", "c1"):
            conv = params[f"feat_{l}"][c]["conv"]
            pyramid.append(make_conv(np.asarray(conv["kernel"]),
                                     np.asarray(conv["bias"])))

    def decoder_seq(d):
        out: List[Dict] = []
        for key in ("c0", "c1", "c2", "c3", "c4", "out"):
            conv = d[key]["conv"]
            out.append(make_conv(np.asarray(conv["kernel"]),
                                 np.asarray(conv["bias"])))
            if key != "out":
                out.append(aux_module("nn.LeakyReLU", negval=0.2,
                                      inplace=True))
        return out

    l_st = max(skip + 1, 1)
    level_seqs = []
    for l in range(levels, l_st - 1, -1):
        lvl: List[Dict] = [
            aux_module("nn.CostVolMulti", win=9, fwd=True, frames=frames),
            aux_module("nn.CostVolMulti", win=9, fwd=False, frames=frames),
            aux_module("nn.JoinTable", dimension=2)]
        if frames > 2:
            lvl += decoder_seq(params[f"occ_decoder_{l}"])
            lvl.append(aux_module("nn.SpatialSoftMax"))
        lvl += decoder_seq(params[f"flow_decoder_{l}"])
        if past_flow:
            lvl += decoder_seq(params[f"past_decoder_{l}"])
        lvl += [aux_module("nn.SpatialUpSamplingBilinear", owidth=0,
                           oheight=0),
                aux_module("nn.BilinearSamplerBHWD"),
                aux_module("nn.MulConstant", constant_scalar=-1.0)]
        level_seqs.append(lvl)

    if flatten_storage:
        # flatten BEFORE cloning so the clones view the same flat storage
        # at the same offsets, like real post-getParameters() clones
        _flatten_into_one_storage(created)

    seq: List[Optional[Dict]] = [None]  # nngraph input node (no module)
    for m in pyramid:
        seq += [m, aux_module("nn.LeakyReLU", negval=0.2, inplace=True)]
    for _ in range(2, frames + 1):  # siamese clones, storage-shared
        for m in pyramid:
            seq += [clone_conv(m),
                    aux_module("nn.LeakyReLU", negval=0.2, inplace=True)]
    for lvl in level_seqs:
        seq += lvl
    seq.append(None)  # output node

    nodes = make_nodes(seq)
    gm: Dict[str, Any] = {
        "torch_type": "nn.gModule",
        # scrambled order on purpose (see conv_module)
        "train": False,
        "bg": {"torch_type": "graph.Graph",
               "nodes": list(reversed(nodes)), "edges": []},
        "forwardnodes": nodes,
        "innode": nodes[0],
        "backwardnodes": list(reversed(nodes)),
        "fg": {"torch_type": "graph.Graph", "nodes": nodes,
               "edges": [{"torch_type": "graph.Edge", "from": a, "to": b}
                         for a, b in zip(nodes[:-1], nodes[1:])]},
        "outnode": nodes[-1],
        "flow_scale": [2.0 ** i for i in range(levels)],
        "nInputs": frames,
    }
    if include_modules_key:
        gm["modules"] = [n["data"]["module"] for n in nodes
                         if "module" in n["data"]]
    return gm


def _flatten_into_one_storage(conv_mods: List[Dict]) -> None:
    """Re-point every conv's weight/bias at offsets inside ONE flat
    storage (what model:getParameters() leaves behind in saved nets)."""
    pieces = []
    total = 0
    for m in conv_mods:
        for k in ("weight", "bias"):
            t: TV = m[k]
            pieces.append((m, k, t, total))
            total += t.storage.size
    flat = np.empty(total, np.float32)
    for m, k, t, off in pieces:
        flat[off:off + t.storage.size] = t.storage
        m[k] = TV(flat, t.shape, t.stride, off, t.cls)


def wrap_dpt(gm: Dict[str, Any]) -> Dict[str, Any]:
    """nn.DataParallelTable wrapper as saveDataParallel leaves it
    (util.lua:50-78: cleanDPT keeps a single inner module)."""
    return {
        "torch_type": "nn.DataParallelTable",
        "dimension": 1,
        "flattenParams": True,
        "usenccl": False,
        "modules": [gm],
        "gpuAssignments": [1],
        "inputGpu": [], "gradOutputGpu": [], "outputGpu": [],
        "flow_scale": gm.get("flow_scale"),
        "impl": None,
    }
