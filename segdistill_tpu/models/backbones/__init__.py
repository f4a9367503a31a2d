from .mix_transformer import (MixVisionTransformer, mit_b0, mit_b1, mit_b2,
                              mit_b3, mit_b4, mit_b5)
from .resnet import ResNet, ResNetV1c, ResNetV1d
from .resnext import ResNeXt
from .resnest import ResNeSt
from .swin_transformer import SwinTransformer
from .mobilenet_v2 import MobileNetV2
from .mobilenet_v3 import MobileNetV3
from .hrnet import HRNet
from .unet import UNet
from .fast_scnn import FastSCNN
from .cgnet import CGNet

__all__ = [
    'MixVisionTransformer', 'mit_b0', 'mit_b1', 'mit_b2', 'mit_b3', 'mit_b4',
    'mit_b5', 'ResNet', 'ResNetV1c', 'ResNetV1d', 'ResNeXt', 'ResNeSt',
    'SwinTransformer', 'MobileNetV2', 'MobileNetV3', 'HRNet', 'UNet',
    'FastSCNN', 'CGNet'
]
