"""Model graphs (flax linen, NHWC): multi-frame PWC net and SPyNet."""

from .factory import model_and_config, model_for_config
from .layers import ConvUnit, Decoder, torch_conv_init
from .pwc import PWCConfig, PWCNet, pwc_config_from_options
from .spynet import SPyNetConfig, SPyNet, spynet_config_from_options
from .surgery import convert_hard_to_soft

__all__ = [
    "ConvUnit", "Decoder", "torch_conv_init",
    "PWCConfig", "PWCNet", "pwc_config_from_options",
    "SPyNetConfig", "SPyNet", "spynet_config_from_options",
    "convert_hard_to_soft", "model_and_config", "model_for_config",
]
