"""Multi-frame PWC network (flax linen, NHWC).

A TPU-first rebuild of the reference graph (models/pwc.lua:87-508): a
shared-weight conv feature pyramid per frame, and per pyramid level
(coarsest -> finest computed level) forward/backward multi-frame cost
volumes, an occlusion decoder with channel softmax, flow decoder(s), and
bilinear warping of features (for the next level) and of full-res image
pyramids (for the photometric losses).

Output: list of per-level dicts, FINEST first (matching the reference's
output-table order, models/pwc.lua:458-489):
  {"flow": (B,h,w,2), "flow_past": (B,h,w,2)|None, "occ": (B,h,w,2)|None,
   "warped": [(B,h,w,3) for each non-reference frame, frame order],
   "flow_scale": float}
Level ``k`` has spatial size (H/2^k, W/2^k).

The hard linear-motion constraint keeps the single future-flow decoder and
warps past frames with negative multiples of the future flow
(models/pwc.lua:438-446); ``past_flow=True`` (soft constraint) adds separate
past-flow decoders.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import (
    avg_pool2, cost_volume_multi, spatial_softmax,
    upsample_bilinear2x, upsample_nearest2x, warp_bilinear,
)
from .layers import ConvUnit, Decoder

# d = 16 (models/pwc.lua:29); feature dims per level (models/pwc.lua:89)
_D = 16
_FEAT_MAPS = (3, _D, _D * 2, _D * 4, _D * 6, _D * 8, _D * 12)


def _pin_img(t):
    """Pin an image-pyramid tensor to channels-major (NCHW) layout on TPU.

    XLA's layout assignment otherwise couples the 3-channel full-res
    image pipeline (quad neighborhood stacks, photometric losses) to
    conv-land layouts, leaving its fused loops iterating the C=3/12
    minor dim at C/128 lane utilization. Channels-major puts W in lanes
    and H in sublanes (full packing); measured on v5e it takes the
    320x640 pme train step from 112.7 to 81.6 ms device (-27%), with
    the warp gathers unchanged. No-op off-TPU (and under
    B2F_IMG_LAYOUT=none) — layout is representation-only, numerics are
    identical."""
    import os

    from ..ops.layout import pin_layout

    if os.environ.get("B2F_IMG_LAYOUT", "").strip().lower() == "none":
        return t
    return pin_layout(t, (0, 3, 1, 2))


@dataclasses.dataclass(frozen=True)
class PWCConfig:
    frames: int = 3
    levels: int = 7
    win: int = 9              # -pwc_ws
    skip: int = 2             # -pwc_skip
    siamese: int = 1          # -pwc_siamese
    two_frame: int = 0
    flownet_factor: float = 20.0
    rescale_flow: int = 0
    residual: int = 0         # -residual
    occ_input: int = 0
    sum_cvs: bool = False     # -pwc_sum_cvs
    past_flow: bool = False
    dtype: Any = jnp.float32
    reference_grads: bool = True
    use_pallas: bool = False   # fused TPU cost-volume kernel

    @property
    def ref(self) -> int:
        """1-indexed reference frame (models/pwc.lua:130-133)."""
        return 1 if self.frames == 2 else (self.frames + 1) // 2

    @property
    def l_st(self) -> int:
        """Finest computed level (models/pwc.lua:136)."""
        return max(self.skip + 1, 1)

    @property
    def feat_maps(self) -> tuple:
        fm = list(_FEAT_MAPS)
        while len(fm) < self.levels:
            fm.append(fm[-1])
        if self.skip == 0:
            fm[0] = fm[1]
        if self.siamese == 0:
            fm = [3] * max(self.levels + 1, len(fm))
        return tuple(fm)

    @property
    def flow_scales(self) -> tuple:
        """flow_scale per output level, FINEST first
        (models/pwc.lua:450-455 records coarsest-first; train.lua:425 indexes
        it back to finest-first, which is the order used here)."""
        out = []
        for l in range(self.l_st, self.levels + 1):
            if self.rescale_flow == 1:
                out.append(self.flownet_factor)
            else:
                out.append(self.flownet_factor / (2.0 ** (l - self.l_st)))
        return tuple(out)

    @property
    def num_output_levels(self) -> int:
        return self.levels - self.l_st + 1


def pwc_config_from_options(opt) -> PWCConfig:
    """Build from a config.Options (mirrors models/pwc.lua:103-117)."""
    return PWCConfig(
        frames=opt.frames, levels=opt.levels, win=opt.pwc_ws,
        skip=opt.pwc_skip, siamese=opt.pwc_siamese, two_frame=opt.two_frame,
        flownet_factor=opt.flownet_factor, rescale_flow=opt.rescale_flow,
        residual=opt.residual, occ_input=opt.occ_input,
        sum_cvs=opt.pwc_sum_cvs, past_flow=opt.past_flow,
        dtype={"float32": jnp.float32, "bfloat16": jnp.bfloat16}[opt.compute_dtype],
        reference_grads=opt.reference_grads,
        use_pallas=opt.use_pallas,
    )


class PWCNet(nn.Module):
    cfg: PWCConfig

    def setup(self):
        cfg = self.cfg
        fm = cfg.feat_maps
        nd = cfg.win * cfg.win
        multi = cfg.frames > 2 and cfg.two_frame == 0
        if cfg.sum_cvs or not multi:
            nd_flow = nd
        else:
            nd_flow = nd * 2
        nd_occ = nd * 2 if multi else nd
        self._nd_flow, self._nd_occ = nd_flow, nd_occ

        # Shared-weight (siamese) feature pyramid: one ConvUnit per level,
        # applied to every frame (weight sharing by module reuse;
        # reference clones with shared storage, models/pwc.lua:187-195).
        feats = {}
        if cfg.siamese == 1:
            if cfg.skip == 0:
                feats[1] = ConvUnit(fm[0], stride=1, dtype=cfg.dtype, name="feat_1")
            for l in range(2, cfg.levels + 1):
                feats[l] = ConvUnit(fm[l - 1], stride=2, dtype=cfg.dtype,
                                    name=f"feat_{l}")
        self._feats = feats

        flow_dec, past_dec, occ_dec = {}, {}, {}
        for l in range(cfg.l_st, cfg.levels + 1):
            flow_dec[l] = Decoder(dtype=cfg.dtype, name=f"flow_decoder_{l}")
            if cfg.past_flow:
                past_dec[l] = Decoder(dtype=cfg.dtype, name=f"past_decoder_{l}")
            if cfg.frames > 2:
                occ_dec[l] = Decoder(dtype=cfg.dtype, name=f"occ_decoder_{l}")
        self._flow_dec, self._past_dec, self._occ_dec = flow_dec, past_dec, occ_dec

    def _features(self, img, l):
        """Apply pyramid stages 2..l (and stage 1 when skip==0) to a frame."""
        cfg = self.cfg
        x = img
        cs = {1: x}
        if cfg.siamese == 1:
            if cfg.skip == 0:
                cs[1] = self._feats[1](x)
            start = 2
            if self._stem_fusable(cs[1]):
                cs[2], cs[3] = self._stem(cs[1])
                start = 4
            for ll in range(start, cfg.levels + 1):
                cs[ll] = self._feats[ll](cs[ll - 1])
        else:
            for ll in range(2, cfg.levels + 1):
                cs[ll] = avg_pool2(cs[ll - 1])
        return cs

    def _stem_fusable(self, x) -> bool:
        """Whether levels 2+3 can run through the fused Pallas stem
        (ops/stem_pallas.py): default feature dims, raw 3-channel input
        (skip!=0 so no feat_1 stage), lane-aligned spatial dims, and the
        kernel opted in (default OFF — measured slower than XLA's native
        stride-2 lowering, see BENCHMARKS.md; B2F_STEM_PALLAS=1 enables)."""
        from ..ops.stem_pallas import stem_eligible, stem_pallas_enabled

        cfg = self.cfg
        fm = cfg.feat_maps
        return (cfg.skip != 0 and cfg.levels >= 3 and x.shape[-1] == 3
                and stem_eligible(x.shape[1], x.shape[2], 3, fm[1], fm[2])
                and stem_pallas_enabled())

    def _stem(self, x):
        """Levels 2+3 via the fused kernel; the ConvUnits' own params are
        read directly so checkpoints/converter/surgery are unaffected.
        During init the plain modules run so the params get created."""
        from ..ops.stem_pallas import fused_stem

        if self.is_initializing():
            f2 = self._feats[2](x)
            return f2, self._feats[3](f2)
        p2 = self._feats[2].variables["params"]
        p3 = self._feats[3].variables["params"]
        return fused_stem(x, p2, p3, self.cfg.dtype)

    def __call__(self, x: jax.Array) -> List[Dict[str, Any]]:
        cfg = self.cfg
        F = cfg.frames

        if x.shape[-1] != 3 * F:
            raise ValueError(f"expected {3*F} input channels, got {x.shape[-1]}")
        x = x.astype(cfg.dtype)

        Is = {f: x[..., 3 * (f - 1): 3 * f] for f in range(1, F + 1)}

        # frame range with features/cost volumes (models/pwc.lua:161-166)
        f_i, l_i = (cfg.ref, cfg.ref + 1) if cfg.two_frame == 1 else (1, F)

        # feature pyramids: the weights are shared across frames (siamese),
        # so run ONE conv chain over the frame-stacked batch and split —
        # identical numerics, 3x larger conv batches (better MXU
        # utilization for the small-channel early levels)
        f_range = list(range(f_i, l_i + 1))
        stacked = jnp.concatenate([Is[f] for f in f_range], axis=0)
        css = self._features(stacked, cfg.levels)
        n = x.shape[0]
        cs = {f: {l: feat[k * n:(k + 1) * n] for l, feat in css.items()}
              for k, f in enumerate(f_range)}

        return self._decode(x, cs)

    def pyramid(self, frame: jax.Array) -> Dict[int, jax.Array]:
        """Siamese feature pyramid of ONE frame: (B, H, W, 3) -> {level:
        (B, H/2^(l-1), W/2^(l-1), C_l)}. Exposed (via ``apply(...,
        method=PWCNet.pyramid)``) for streaming video inference: in a
        sliding F-frame window every frame's pyramid is identical in all
        F windows it appears in (the extractor is weight-shared across
        frames, models/pwc.lua:187-195, and depends only on the frame),
        so a video pipeline computes N pyramids instead of F*(N-F+1) and
        decodes from them with `from_pyramids` (api.compute_flow_video).
        """
        if frame.shape[-1] != 3:
            raise ValueError(
                f"pyramid() takes one (B, H, W, 3) frame, got channels="
                f"{frame.shape[-1]}")
        return self._features(frame.astype(self.cfg.dtype), self.cfg.levels)

    def from_pyramids(self, x: jax.Array,
                      cs: Dict[int, Dict[int, jax.Array]]
                      ) -> List[Dict[str, Any]]:
        """Forward from precomputed per-frame feature pyramids.

        `x` is the usual (B, H, W, 3F) frame stack (still needed for the
        photometric image warps); `cs[f][l]` is frame f's `pyramid()`
        output. Produces the same outputs as ``__call__`` (the pyramid is
        a pure per-frame function), without recomputing the extractor.
        """
        cfg = self.cfg
        if x.shape[-1] != 3 * cfg.frames:
            raise ValueError(
                f"expected {3*cfg.frames} input channels, got {x.shape[-1]}")
        f_i, l_i = (cfg.ref, cfg.ref + 1) if cfg.two_frame == 1 else \
            (1, cfg.frames)
        missing = [f for f in range(f_i, l_i + 1) if f not in cs]
        if missing:
            raise ValueError(f"from_pyramids: missing pyramids for frames "
                             f"{missing} (need {f_i}..{l_i})")
        cs = {f: {l: feat.astype(cfg.dtype) for l, feat in d.items()}
              for f, d in cs.items()}
        return self._decode(x.astype(cfg.dtype), cs)

    def _decode(self, x: jax.Array, cs: Dict[int, Dict[int, jax.Array]]
                ) -> List[Dict[str, Any]]:
        """Coarse-to-fine decode given per-frame feature pyramids
        (everything after the extractor: cost volumes, occ/flow decoders,
        feature + image warps, output assembly)."""
        cfg = self.cfg
        F, ref, l_st = cfg.frames, cfg.ref, cfg.l_st
        levels = cfg.levels
        factor = cfg.flownet_factor
        wb = lambda im, fl: warp_bilinear(im, fl, reference_grads=cfg.reference_grads)

        Is = {f: x[..., 3 * (f - 1): 3 * f] for f in range(1, F + 1)}

        # frame range with features/cost volumes (models/pwc.lua:161-166)
        f_i, l_i = (ref, ref + 1) if cfg.two_frame == 1 else (1, F)

        # image pyramids of non-ref frames for photometric warps
        # (ds[f][j] = image downsampled j times; models/pwc.lua:147-158)
        ds = {}
        # NOTE: pinning only the finest entries compiles to the *same*
        # executable as pinning all of them (layout assignment propagates
        # the constraint down the avg_pool chain; verified by identical
        # post-optimization fingerprints on v5e) — so every entry is
        # pinned for clarity, and B2F_IMG_LAYOUT=none is the only knob.
        for f in range(1, F + 1):
            if f != ref:
                chain = [_pin_img(Is[f])]
                for _ in range(levels - l_st):
                    chain.append(_pin_img(avg_pool2(chain[-1])))
                ds[f] = chain

        ws: Dict[int, Dict[int, jax.Array]] = {f: {} for f in range(1, F + 1)}
        ufs: Dict[int, jax.Array] = {}
        ubfs: Dict[int, jax.Array] = {}
        uoccs: Dict[int, jax.Array] = {}
        fs: Dict[int, jax.Array] = {}
        bfs: Dict[int, jax.Array] = {}
        occs: Dict[int, jax.Array] = {}
        skip_ufs: Dict[int, jax.Array] = {}
        skip_ubfs: Dict[int, jax.Array] = {}
        skip_occs: Dict[int, jax.Array] = {}
        iws: Dict[int, Dict[int, jax.Array]] = {f: {} for f in range(1, F + 1)}

        multi = F > 2 and cfg.two_frame == 0

        for l in range(levels, l_st - 1, -1):
            # cost-volume inputs: raw features at the coarsest level, warped
            # features below (models/pwc.lua:238-244)
            inp = cs if l == levels else ws

            future = [inp[f][l] for f in range(ref + 1, l_i + 1)]
            cv_fwd = cost_volume_multi(cs[ref][l], future, cfg.win, fwd=True,
                                       use_pallas=cfg.use_pallas)

            if multi:
                past = [inp[f][l] for f in range(ref - 1, 0, -1)]
                cv_bwd = cost_volume_multi(cs[ref][l], past, cfg.win, fwd=False,
                                           use_pallas=cfg.use_pallas)
                if cfg.sum_cvs:
                    cvs_flow = cv_fwd + cv_bwd
                else:
                    cvs_flow = jnp.concatenate([cv_fwd, cv_bwd], axis=-1)
                cvs_occ = jnp.concatenate([cv_fwd, cv_bwd], axis=-1)
            else:
                cvs_flow = cv_fwd
                cvs_occ = cv_fwd

            # occlusion decoder (models/pwc.lua:286-321)
            if F > 2:
                occ_in = [cvs_occ, cs[ref][l]]
                if cfg.two_frame == 1:
                    occ_in.append(cs[ref + 1][l])
                if l != levels:
                    occ_in.append(ufs[l + 1])
                    if cfg.occ_input == 1:
                        occ_in.append(uoccs[l + 1])
                occs[l] = spatial_softmax(
                    self._occ_dec[l](jnp.concatenate(occ_in, axis=-1)))
                if cfg.skip > 0 or cfg.occ_input == 1:
                    uoccs[l] = upsample_nearest2x(occs[l])
                if cfg.skip > 0:
                    so = uoccs[l]
                    for _ in range(2, l_st):
                        so = upsample_nearest2x(so)
                    skip_occs[l] = so

            # flow decoder(s) (models/pwc.lua:324-352)
            if l == levels:
                fs[l] = self._flow_dec[l](cvs_flow)
                if cfg.past_flow:
                    bfs[l] = self._past_dec[l](cvs_flow)
            else:
                dec_in = jnp.concatenate([cvs_flow, cs[ref][l], ufs[l + 1]], axis=-1)
                d = self._flow_dec[l](dec_in)
                fs[l] = d + ufs[l + 1] if cfg.residual == 1 else d
                if cfg.past_flow:
                    dec_in_b = jnp.concatenate([cvs_flow, cs[ref][l], ubfs[l + 1]], axis=-1)
                    db = self._past_dec[l](dec_in_b)
                    bfs[l] = db + ubfs[l + 1] if cfg.residual == 1 else db

            # upsample flow chains (models/pwc.lua:354-390)
            if cfg.skip > 0 or l > l_st:
                ufs[l] = upsample_bilinear2x(fs[l])
                if cfg.past_flow:
                    ubfs[l] = upsample_bilinear2x(bfs[l])
                if cfg.rescale_flow == 1:
                    ufs[l] = ufs[l] * 2.0
                    if cfg.past_flow:
                        ubfs[l] = ubfs[l] * 2.0
                if cfg.skip > 0:
                    su, sub = ufs[l], (ubfs.get(l) if cfg.past_flow else None)
                    for _ in range(2, l_st):
                        su = upsample_bilinear2x(su)
                        if cfg.rescale_flow == 1:
                            su = su * 2.0
                        if sub is not None:
                            sub = upsample_bilinear2x(sub)
                            if cfg.rescale_flow == 1:
                                sub = sub * 2.0
                    skip_ufs[l] = su
                    if cfg.past_flow:
                        skip_ubfs[l] = sub

            # warps (models/pwc.lua:392-448)
            for f in range(1, F + 1):
                if f == ref:
                    continue
                # feature warp for the next (finer) level's cost volumes
                if l > l_st and f_i <= f <= l_i:
                    if cfg.rescale_flow == 1:
                        m = factor * (f - ref)
                    else:
                        m = factor * (f - ref) / (2.0 ** (l - 2))
                    ws[f][l - 1] = wb(cs[f][l - 1], ufs[l] * m)

                # image warp at this level's output resolution
                if cfg.skip == 0:
                    base = bfs[l] if (cfg.past_flow and f < ref) else fs[l]
                else:
                    base = skip_ubfs[l] if (cfg.past_flow and f < ref) else skip_ufs[l]
                # NOTE: past multiplier stays negative even with a separate
                # past decoder, so hard-model weights transfer
                # (models/pwc.lua:438-444)
                if cfg.rescale_flow == 1:
                    m = factor * (f - ref)
                else:
                    m = factor * (f - ref) / (2.0 ** (l - l_st))
                iws[f][l] = wb(ds[f][l - l_st], base * m)

        # assemble output groups, FINEST first (models/pwc.lua:458-489)
        out: List[Dict[str, Any]] = []
        scales = cfg.flow_scales
        for idx, l in enumerate(range(l_st, levels + 1)):
            group: Dict[str, Any] = {}
            if cfg.skip == 0:
                group["flow"] = fs[l]
                group["flow_past"] = bfs[l] if cfg.past_flow else None
            else:
                group["flow"] = skip_ufs[l]
                group["flow_past"] = skip_ubfs[l] if cfg.past_flow else None
            if F > 2:
                group["occ"] = skip_occs[l] if cfg.skip > 0 else occs[l]
            else:
                group["occ"] = None
            group["warped"] = [iws[f][l] for f in range(1, F + 1) if f != ref]
            group["flow_scale"] = scales[idx]
            out.append(group)
        return out
