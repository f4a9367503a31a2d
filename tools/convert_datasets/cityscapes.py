#!/usr/bin/env python
"""Cityscapes: generate *_gtFine_labelTrainIds.png from labelIds
(ref contract: tools/convert_datasets/cityscapes.py — which shells out to
cityscapesscripts; here the official id->trainId table is applied directly,
no extra dependency)."""

import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))
from segdistill_tpu.utils import image as imutil

# official cityscapes labelId -> trainId (255 = ignore)
ID2TRAIN = np.full(256, 255, np.uint8)
for lid, tid in [(7, 0), (8, 1), (11, 2), (12, 3), (13, 4), (17, 5),
                 (19, 6), (20, 7), (21, 8), (22, 9), (23, 10), (24, 11),
                 (25, 12), (26, 13), (27, 14), (28, 15), (31, 16),
                 (32, 17), (33, 18)]:
    ID2TRAIN[lid] = tid


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('cityscapes_path', help='root with gtFine/')
    parser.add_argument('--gt-dir', default='gtFine')
    args = parser.parse_args()

    gt_root = osp.join(args.cityscapes_path, args.gt_dir)
    count = 0
    for root, _, files in os.walk(gt_root):
        for f in files:
            if not f.endswith('_labelIds.png'):
                continue
            src = osp.join(root, f)
            label = imutil.imread(src, flag='unchanged')
            train = ID2TRAIN[label]
            dst = src.replace('_labelIds.png', '_labelTrainIds.png')
            imutil.imwrite(train, dst)
            count += 1
    print(f'converted {count} annotation maps')


if __name__ == '__main__':
    main()
