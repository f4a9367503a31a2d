from .conv_module import ConvModule, DepthwiseSeparableConvModule
from .norm import FusedLayerNorm, NormLayer, build_norm_layer
from .activation import build_activation
from .drop import DropPath
from .misc import make_divisible, to_2tuple, trunc_normal_init
from .se_layer import SELayer
from .inverted_residual import InvertedResidual, InvertedResidualV3

__all__ = [
    'ConvModule', 'DepthwiseSeparableConvModule', 'NormLayer',
    'build_norm_layer', 'FusedLayerNorm', 'build_activation', 'DropPath', 'make_divisible',
    'to_2tuple', 'trunc_normal_init', 'SELayer', 'InvertedResidual',
    'InvertedResidualV3'
]
