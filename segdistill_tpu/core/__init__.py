from .utils import add_prefix
from .evaluation import (eval_metrics, mean_iou, mean_dice,
                         intersect_and_union, total_intersect_and_union,
                         get_classes, get_palette, EvalHook)
from .seg import build_pixel_sampler, BasePixelSampler, OHEMPixelSampler

__all__ = [
    'add_prefix', 'eval_metrics', 'mean_iou', 'mean_dice',
    'intersect_and_union', 'total_intersect_and_union', 'get_classes',
    'get_palette', 'EvalHook', 'build_pixel_sampler', 'BasePixelSampler',
    'OHEMPixelSampler'
]
