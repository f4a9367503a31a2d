from .metrics import (eval_metrics, intersect_and_union, mean_dice, mean_iou,
                      total_intersect_and_union, confusion_histograms,
                      metrics_from_histograms)
from .class_names import get_classes, get_palette
from .eval_hooks import EvalHook

__all__ = [
    'eval_metrics', 'intersect_and_union', 'mean_dice', 'mean_iou',
    'total_intersect_and_union', 'confusion_histograms', 'get_classes',
    'get_palette', 'EvalHook'
]
