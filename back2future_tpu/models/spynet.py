"""SPyNet variant (flax linen, NHWC).

Rebuild of the reference spatial-pyramid network (models/spynet.lua:17-173):
an input image pyramid; per level a 5-conv 7x7 stack (32-64-32-16 -> 2-ch
flow, plus a 2-ch softmax occlusion head when frames > 2); non-reference
frames warped by the upsampled coarser flow before entering the level;
optional flow/occ input channels and residual flow.

Faithfully replicated quirk: with residual=1 the reference adds the
upsampled flow twice to the *output* flow (once inside volcon_level,
models/spynet.lua:33-35, and again at models/spynet.lua:144-147) while the
level's internal warps use the singly-added flow; the next level then
upsamples the doubled output flow (models/spynet.lua:99).

Output: list of per-level dicts, FINEST first, same schema as PWCNet
(flow_past always None).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import avg_pool2, spatial_softmax, upsample_bilinear2x, \
    upsample_nearest2x, warp_bilinear
from .layers import Conv


@dataclasses.dataclass(frozen=True)
class SPyNetConfig:
    frames: int = 3
    levels: int = 7
    flownet_factor: float = 20.0
    rescale_flow: int = 0
    residual: int = 0
    flow_input: int = 1
    occ_input: int = 0
    dtype: Any = jnp.float32
    reference_grads: bool = True

    @property
    def ref(self) -> int:
        return 1 if self.frames == 2 else (self.frames + 1) // 2

    @property
    def flow_scales(self) -> tuple:
        """Per output level, FINEST first (models/spynet.lua:154-158)."""
        if self.rescale_flow == 1:
            return tuple(self.flownet_factor for _ in range(self.levels))
        return tuple(self.flownet_factor / (2.0 ** k) for k in range(self.levels))

    @property
    def num_output_levels(self) -> int:
        return self.levels


def spynet_config_from_options(opt) -> SPyNetConfig:
    return SPyNetConfig(
        frames=opt.frames, levels=opt.levels,
        flownet_factor=opt.flownet_factor, rescale_flow=opt.rescale_flow,
        residual=opt.residual, flow_input=opt.flow_input,
        occ_input=opt.occ_input,
        dtype={"float32": jnp.float32, "bfloat16": jnp.bfloat16}[opt.compute_dtype],
        reference_grads=opt.reference_grads,
    )


class _VolconTrunk(nn.Module):
    """7x7 conv stack 32-64-32-16 with ReLU (models/spynet.lua:18-21)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, w in enumerate((32, 64, 32, 16)):
            x = jax.nn.relu(Conv(w, kernel=7, dtype=self.dtype, name=f"c{i}")(x))
        return x


class SPyNet(nn.Module):
    cfg: SPyNetConfig

    def setup(self):
        cfg = self.cfg
        self._trunks = {l: _VolconTrunk(dtype=cfg.dtype, name=f"trunk_{l}")
                        for l in range(1, cfg.levels + 1)}
        self._flow_heads = {l: Conv(2, kernel=7, dtype=cfg.dtype, name=f"flow_head_{l}")
                            for l in range(1, cfg.levels + 1)}
        if cfg.frames > 2:
            self._occ_heads = {l: Conv(2, kernel=7, dtype=cfg.dtype, name=f"occ_head_{l}")
                               for l in range(1, cfg.levels + 1)}
        else:
            self._occ_heads = {}

    def __call__(self, x: jax.Array) -> List[Dict[str, Any]]:
        cfg = self.cfg
        F, ref, levels = cfg.frames, cfg.ref, cfg.levels
        factor = cfg.flownet_factor
        wb = lambda im, fl: warp_bilinear(im, fl, reference_grads=cfg.reference_grads)
        x = x.astype(cfg.dtype)

        # input pyramid, level l in 1..levels (1 = coarsest;
        # models/spynet.lua:85-90)
        downs = {levels: x}
        for l in range(levels - 1, 0, -1):
            downs[l] = avg_pool2(downs[l + 1])

        def frame_slice(t, f):
            return t[..., 3 * (f - 1): 3 * f]

        out_levels: Dict[int, Dict[str, Any]] = {}
        prev_flow = None
        prev_occ = None
        for l in range(1, levels + 1):
            lvl = levels - l  # the reference's `lvl` exponent
            if l == 1:
                level_in = downs[l]
                ups_flow = None
            else:
                ups_flow = upsample_bilinear2x(prev_flow)
                if cfg.rescale_flow == 1:
                    ups_flow = ups_flow * 2.0
                parts = []
                for f in range(1, F + 1):
                    if f != ref:
                        if cfg.rescale_flow == 1:
                            m = factor * (f - ref)
                        else:
                            m = factor * (f - ref) / (2.0 ** (levels - l))
                        parts.append(wb(frame_slice(downs[l], f), ups_flow * m))
                    else:
                        parts.append(frame_slice(downs[l], f))
                if cfg.flow_input == 1:
                    parts.append(ups_flow)
                if F > 2 and cfg.occ_input == 1:
                    parts.append(upsample_nearest2x(prev_occ))
                level_in = jnp.concatenate(parts, axis=-1)

            trunk = self._trunks[l](level_in)
            flow = self._flow_heads[l](trunk)
            # residual add inside the level (models/spynet.lua:33-35)
            if ups_flow is not None and cfg.residual == 1:
                flow = flow + ups_flow

            occ = None
            if F > 2:
                occ = spatial_softmax(self._occ_heads[l](trunk))

            # per-level output warps re-warp the level INPUT channels, which
            # for f != ref are already-warped frames (models/spynet.lua:37-57)
            warped = []
            for f in range(1, F + 1):
                if f == ref:
                    continue
                if cfg.rescale_flow == 1:
                    m = factor * (f - ref)
                else:
                    m = factor * (f - ref) / (2.0 ** lvl)
                warped.append(wb(frame_slice(level_in, f), flow * m))

            out_flow = flow
            # second residual add on the OUTPUT flow only
            # (models/spynet.lua:144-147)
            if ups_flow is not None and cfg.residual == 1:
                out_flow = out_flow + ups_flow

            out_levels[l] = {
                "flow": out_flow,
                "flow_past": None,
                "occ": occ,
                "warped": warped,
                "flow_scale": cfg.flow_scales[levels - l],
            }
            # the next level upsamples out_level[l-1][1] — the OUTPUT flow,
            # i.e. the doubled flow when residual=1 (models/spynet.lua:99,146)
            prev_flow = out_flow
            prev_occ = occ

        # finest first
        return [out_levels[l] for l in range(levels, 0, -1)]
