#!/usr/bin/env python
"""Pascal VOC augmented (SBD) .mat -> .png
(ref contract: tools/convert_datasets/voc_aug.py)."""

import argparse
import os
import os.path as osp
import sys

import numpy as np
from scipy.io import loadmat

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))
from segdistill_tpu.utils import image as imutil


def convert_mat(mat_file, out_dir):
    mat = loadmat(mat_file)
    seg = mat['GTcls'][0]['Segmentation'][0].astype(np.uint8)
    name = osp.splitext(osp.basename(mat_file))[0] + '.png'
    imutil.imwrite(seg, osp.join(out_dir, name))
    return name


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('devkit_path', help='VOCdevkit root')
    parser.add_argument('aug_path', help='SBD benchmark_RELEASE root')
    args = parser.parse_args()

    out_dir = osp.join(args.devkit_path, 'VOC2012',
                       'SegmentationClassAug')
    os.makedirs(out_dir, exist_ok=True)
    mat_dir = osp.join(args.aug_path, 'dataset', 'cls')
    names = []
    for f in sorted(os.listdir(mat_dir)):
        if f.endswith('.mat'):
            names.append(convert_mat(osp.join(mat_dir, f), out_dir))
    print(f'converted {len(names)} SBD annotations into {out_dir}')

    # merged trainaug split
    split_dir = osp.join(args.devkit_path, 'VOC2012', 'ImageSets',
                         'Segmentation')
    with open(osp.join(args.aug_path, 'dataset', 'train.txt')) as f:
        aug = {line.strip() for line in f}
    with open(osp.join(split_dir, 'train.txt')) as f:
        train = {line.strip() for line in f}
    with open(osp.join(split_dir, 'val.txt')) as f:
        val = {line.strip() for line in f}
    trainaug = sorted((aug | train) - val)
    with open(osp.join(split_dir, 'trainaug.txt'), 'w') as f:
        f.write('\n'.join(trainaug) + '\n')
    print(f'wrote trainaug split ({len(trainaug)} images)')


if __name__ == '__main__':
    main()
