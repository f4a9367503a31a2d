"""Metrics vs a naive numpy oracle (ref strategy: tests/test_metrics.py)."""

import numpy as np

from segdistill_tpu.core import eval_metrics, mean_iou, mean_dice
from segdistill_tpu.core.evaluation import confusion_histograms


def _naive(results, gts, num_classes, ignore_index):
    inter = np.zeros(num_classes)
    union = np.zeros(num_classes)
    pred_a = np.zeros(num_classes)
    label_a = np.zeros(num_classes)
    for pred, gt in zip(results, gts):
        mask = gt != ignore_index
        p, g = pred[mask], gt[mask]
        for c in range(num_classes):
            pc, gc = p == c, g == c
            inter[c] += np.sum(pc & gc)
            union[c] += np.sum(pc | gc)
            pred_a[c] += np.sum(pc)
            label_a[c] += np.sum(gc)
    all_acc = inter.sum() / label_a.sum()
    return all_acc, inter / label_a, inter / union, \
        2 * inter / (pred_a + label_a)


def test_eval_metrics_matches_naive():
    rng = np.random.RandomState(0)
    num_classes = 5
    results = [rng.randint(0, num_classes, (16, 16)) for _ in range(4)]
    gts = [rng.randint(0, num_classes, (16, 16)) for _ in range(4)]
    gts[0][0, :4] = 255  # some ignored pixels

    all_acc, acc, iou = eval_metrics(results, gts, num_classes, 255, 'mIoU')
    n_all, n_acc, n_iou, n_dice = _naive(results, gts, num_classes, 255)
    np.testing.assert_allclose(all_acc, n_all)
    np.testing.assert_allclose(acc, n_acc)
    np.testing.assert_allclose(iou, n_iou)

    _, _, dice = eval_metrics(results, gts, num_classes, 255, 'mDice')
    np.testing.assert_allclose(dice, n_dice)


def test_mean_iou_nan_to_num():
    results = [np.zeros((4, 4), np.int64)]
    gts = [np.zeros((4, 4), np.int64)]
    all_acc, acc, iou = mean_iou(results, gts, 3, 255, nan_to_num=-1)
    assert iou[1] == -1 and iou[2] == -1  # absent classes
    assert iou[0] == 1.0


def test_reduce_zero_label():
    results = [np.zeros((4, 4), np.int64)]
    gts = [np.ones((4, 4), np.int64)]  # raw label 1 -> reduced 0
    all_acc, acc, iou = eval_metrics(results, gts, 3, 255,
                                     reduce_zero_label=True)
    assert all_acc == 1.0


def test_confusion_histograms_matches_numpy():
    rng = np.random.RandomState(1)
    pred = rng.randint(0, 4, (2, 8, 8))
    gt = rng.randint(0, 4, (2, 8, 8))
    gt[0, 0] = 255
    inter, union, parea, larea = [np.asarray(x) for x in
                                  confusion_histograms(pred, gt, 4, 255)]
    from segdistill_tpu.core import intersect_and_union
    r_inter, r_union, r_parea, r_larea = intersect_and_union(
        pred, gt, 4, 255)
    np.testing.assert_array_equal(inter, r_inter)
    np.testing.assert_array_equal(union, r_union)
    np.testing.assert_array_equal(parea, r_parea)
    np.testing.assert_array_equal(larea, r_larea)
