"""Segmentation metrics (ref contract: mmseg/core/evaluation/metrics.py:5-229).

Two paths:

* numpy host path (``intersect_and_union`` / ``eval_metrics``) mirroring the
  reference exactly, incl. ``label_map`` remap and ``reduce_zero_label``;
* :func:`confusion_histograms` — a jittable device path producing per-image
  (intersect, union, pred, label) class histograms. Multi-host eval gathers
  these 4xC integer vectors instead of pickled full prediction maps (the
  reference's ``collect_results_*``, apis/test.py:161-235) — the TPU-native
  sufficient-statistics design from SURVEY §2.10.
"""

from collections import OrderedDict

import jax
import jax.numpy as jnp
import numpy as np


def intersect_and_union(pred_label, label, num_classes, ignore_index,
                        label_map=None, reduce_zero_label=False):
    """Per-image histogram quadruple (ref metrics.py:5-59)."""
    if isinstance(pred_label, str):
        pred_label = np.load(pred_label)
    pred_label = np.asarray(pred_label)
    label = np.asarray(label)

    if label_map:
        label = label.copy()
        for old_id, new_id in label_map.items():
            label[label == old_id] = new_id
    if reduce_zero_label:
        label = label.astype(np.int64)
        label[label == 0] = 255
        label = label - 1
        label[label == 254] = 255

    mask = label != ignore_index
    pred_label = pred_label[mask]
    label = label[mask]

    intersect = pred_label[pred_label == label]
    area_intersect = np.bincount(intersect, minlength=num_classes)[
        :num_classes].astype(np.float64)
    area_pred = np.bincount(pred_label, minlength=num_classes)[
        :num_classes].astype(np.float64)
    area_label = np.bincount(label, minlength=num_classes)[
        :num_classes].astype(np.float64)
    area_union = area_pred + area_label - area_intersect
    return area_intersect, area_union, area_pred, area_label


def total_intersect_and_union(results, gt_seg_maps, num_classes,
                              ignore_index, label_map=None,
                              reduce_zero_label=False):
    """Sum histograms over a result list (ref metrics.py:62-102)."""
    total = [np.zeros(num_classes, np.float64) for _ in range(4)]
    for result, gt in zip(results, gt_seg_maps):
        quad = intersect_and_union(result, gt, num_classes, ignore_index,
                                   label_map, reduce_zero_label)
        for t, q in zip(total, quad):
            t += q
    return tuple(total)


def eval_metrics(results, gt_seg_maps, num_classes, ignore_index,
                 metrics='mIoU', nan_to_num=None, label_map=None,
                 reduce_zero_label=False):
    """-> (all_acc, acc, iou[/dice]) per class (ref metrics.py:179-229)."""
    if isinstance(metrics, str):
        metrics = [metrics]
    allowed = {'mIoU', 'mDice'}
    if not set(metrics).issubset(allowed):
        raise KeyError(f'metrics {metrics} is not supported')
    (total_intersect, total_union, total_pred,
     total_label) = total_intersect_and_union(
        results, gt_seg_maps, num_classes, ignore_index, label_map,
        reduce_zero_label)
    return metrics_from_histograms(total_intersect, total_union, total_pred,
                                   total_label, metrics, nan_to_num)


def metrics_from_histograms(total_intersect, total_union, total_pred,
                            total_label, metrics=('mIoU',), nan_to_num=None):
    with np.errstate(divide='ignore', invalid='ignore'):
        all_acc = total_intersect.sum() / total_label.sum()
        acc = total_intersect / total_label
        ret = [all_acc, acc]
        for metric in metrics:
            if metric == 'mIoU':
                ret.append(total_intersect / total_union)
            elif metric == 'mDice':
                ret.append(2 * total_intersect
                           / (total_pred + total_label))
    if nan_to_num is not None:
        ret = [np.nan_to_num(r, nan=nan_to_num) for r in ret]
    return ret


def mean_iou(results, gt_seg_maps, num_classes, ignore_index,
             nan_to_num=None, label_map=None, reduce_zero_label=False):
    """(ref metrics.py:105-140)."""
    all_acc, acc, iou = eval_metrics(results, gt_seg_maps, num_classes,
                                     ignore_index, 'mIoU', nan_to_num,
                                     label_map, reduce_zero_label)
    return all_acc, acc, iou


def mean_dice(results, gt_seg_maps, num_classes, ignore_index,
              nan_to_num=None, label_map=None, reduce_zero_label=False):
    """(ref metrics.py:142-176)."""
    all_acc, acc, dice = eval_metrics(results, gt_seg_maps, num_classes,
                                      ignore_index, 'mDice', nan_to_num,
                                      label_map, reduce_zero_label)
    return all_acc, acc, dice


def confusion_histograms(pred, label, num_classes, ignore_index=255):
    """Jittable per-batch histograms -> (intersect, union, pred, label),
    each (num_classes,) int32. Safe to ``jax.lax.psum`` across the mesh."""
    valid = label != ignore_index
    safe_label = jnp.where(valid, label, num_classes)
    safe_pred = jnp.where(valid, pred, num_classes)

    def hist(x, weights):
        return jnp.zeros(num_classes + 1, jnp.int32).at[x].add(
            weights.astype(jnp.int32))[:num_classes]

    ones = jnp.ones_like(safe_label)
    area_label = hist(safe_label.reshape(-1), ones.reshape(-1))
    area_pred = hist(safe_pred.reshape(-1), ones.reshape(-1))
    agree = (pred == label) & valid
    area_intersect = hist(safe_label.reshape(-1), agree.reshape(-1))
    area_union = area_pred + area_label - area_intersect
    return area_intersect, area_union, area_pred, area_label
