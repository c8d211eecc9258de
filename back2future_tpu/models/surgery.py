"""Hard -> soft constraint model surgery as a named param-tree remap.

The reference converts its hard-constraint model (single future-flow
decoder, past frames warped by negated future flow) into a soft-constraint
model (separate past-flow decoders) by copying module weights through
hard-coded nngraph indices (model.lua:56-116; index maps at model.lua:94-95,
valid only for 7 levels / skip 2).

Here decoders are *named* (`flow_decoder_<l>` / `past_decoder_<l>`), so the
surgery is a structural copy that works for any level count.
"""

from __future__ import annotations

from typing import Any, Dict

import jax


def convert_hard_to_soft(hard_params: Dict[str, Any], soft_params: Dict[str, Any]) -> Dict[str, Any]:
    """Fill a freshly initialized soft (past_flow=True) param tree from a
    hard-model tree: every module that exists in both is copied verbatim,
    and each `past_decoder_<l>` is seeded from the hard `flow_decoder_<l>`.

    Args:
      hard_params: `params` collection of a PWCNet(cfg.past_flow=False).
      soft_params: `params` collection of a PWCNet(cfg.past_flow=True)
        (provides the target structure).
    Returns: new param tree for the soft model.
    """
    hard = dict(hard_params)
    out = {}
    for name, sub in soft_params.items():
        if name in hard:
            src = hard[name]
        elif name.startswith("past_decoder_"):
            level = name[len("past_decoder_"):]
            src = hard[f"flow_decoder_{level}"]
        else:
            raise KeyError(f"no source for soft-model module {name!r}")
        # structural sanity: identical leaf shapes
        jax.tree_util.tree_map(
            lambda a, b: (_ for _ in ()).throw(
                ValueError(f"shape mismatch in {name}: {a.shape} vs {b.shape}"))
            if a.shape != b.shape else None, src, sub)
        out[name] = jax.tree_util.tree_map(lambda a: a, src)
    return out
