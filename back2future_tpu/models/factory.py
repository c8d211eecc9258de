"""netType -> (model, config) dispatch (model.lua:38-44's createModel
switch). One place so the train loop, checkpoint restore templates, and
eval tooling agree on which graph a set of Options describes."""

from __future__ import annotations

from typing import Any, Tuple


def model_and_config(opt) -> Tuple[Any, Any]:
    """Build the flax module + its config for opt.netType."""
    if opt.netType == "pwc":
        from .pwc import PWCNet, pwc_config_from_options

        cfg = pwc_config_from_options(opt)
        return PWCNet(cfg), cfg
    if opt.netType == "spynet":
        from .spynet import SPyNet, spynet_config_from_options

        cfg = spynet_config_from_options(opt)
        return SPyNet(cfg), cfg
    raise ValueError(f"unknown netType {opt.netType!r} (pwc | spynet)")


def model_for_config(cfg) -> Any:
    """Rebuild the module that a restored config describes."""
    from .pwc import PWCConfig, PWCNet
    from .spynet import SPyNet, SPyNetConfig

    if isinstance(cfg, PWCConfig):
        return PWCNet(cfg)
    if isinstance(cfg, SPyNetConfig):
        return SPyNet(cfg)
    raise TypeError(f"unknown model config type {type(cfg).__name__}")
