from .compose import Compose
from .loading import LoadAnnotations, LoadImageFromFile
from .formatting import (Collect, DefaultFormatBundle, ImageToTensor,
                         ToTensor, Transpose)
from .test_time_aug import MultiScaleFlipAug
from .transforms import (AlignedResize, AdjustGamma, CenterCrop, CLAHE,
                         MaillaryHack, Normalize, Pad, PhotoMetricDistortion,
                         RandomCrop, RandomFlip, RandomRotate, Rerange,
                         Resize, RGB2Gray, SegRescale)

__all__ = [
    'Compose', 'LoadAnnotations', 'LoadImageFromFile', 'Collect',
    'DefaultFormatBundle', 'ImageToTensor', 'ToTensor', 'Transpose',
    'MultiScaleFlipAug', 'AlignedResize', 'AdjustGamma', 'CenterCrop',
    'CLAHE', 'MaillaryHack', 'Normalize', 'Pad', 'PhotoMetricDistortion',
    'RandomCrop', 'RandomFlip', 'RandomRotate', 'Rerange', 'Resize',
    'RGB2Gray', 'SegRescale'
]
