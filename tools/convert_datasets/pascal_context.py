#!/usr/bin/env python
"""PASCAL-Context 60-class annotation converter
(ref contract: tools/convert_datasets/pascal_context.py).

Maps the raw Detail-API category ids onto the 60-class PASCAL-Context
subset (index = rank of the id in the sorted 60-id table, ref :10-18) and
writes per-image uint8 PNGs + train/val split lists. Requires the
``detail`` package (the PASCAL-in-Detail API) and the trainval_merged
json, exactly like the reference.
"""

import argparse
import os
import os.path as osp

import numpy as np
from PIL import Image

# the 60 PASCAL-Context category ids (ref pascal_context.py:10-17)
_MAPPING = np.sort(
    np.array([
        0, 2, 259, 260, 415, 324, 9, 258, 144, 18, 19, 22, 23, 397, 25, 284,
        158, 159, 416, 33, 162, 420, 454, 295, 296, 427, 44, 45, 46, 308, 59,
        440, 445, 31, 232, 65, 354, 424, 68, 326, 72, 458, 34, 207, 80, 355,
        85, 347, 220, 349, 360, 98, 187, 104, 105, 366, 189, 368, 113, 115
    ]))
_KEY = np.arange(len(_MAPPING)).astype('uint8')


def class_to_index(mask):
    values = np.unique(mask)
    for v in values:
        assert v in _MAPPING, f'unexpected raw category id {v}'
    index = np.digitize(mask.ravel(), _MAPPING, right=True)
    return _KEY[index].reshape(mask.shape)


def generate_labels(img_id, detail, out_dir):
    mask = Image.fromarray(class_to_index(detail.getMask(img_id)))
    filename = img_id['file_name']
    mask.save(osp.join(out_dir, filename.replace('jpg', 'png')))
    return osp.splitext(osp.basename(filename))[0]


def parse_args():
    parser = argparse.ArgumentParser(
        description='Convert PASCAL-Context annotations')
    parser.add_argument('devkit_path', help='pascal voc devkit path')
    parser.add_argument('json_path', help='trainval_merged.json path')
    parser.add_argument('-o', '--out_dir', help='output path')
    return parser.parse_args()


def main():
    try:
        from detail import Detail
    except ImportError as e:
        raise SystemExit(
            'pascal_context conversion needs the PASCAL-in-Detail API: '
            'pip install git+https://github.com/ccvl/detail-api') from e

    args = parse_args()
    devkit_path = args.devkit_path
    out_dir = args.out_dir or osp.join(devkit_path, 'VOC2010',
                                       'SegmentationClassContext')
    os.makedirs(out_dir, exist_ok=True)
    img_dir = osp.join(devkit_path, 'VOC2010', 'JPEGImages')
    split_dir = osp.join(devkit_path, 'VOC2010', 'ImageSets',
                         'SegmentationContext')
    os.makedirs(split_dir, exist_ok=True)

    for split in ('train', 'val'):
        detail = Detail(args.json_path, img_dir, split)
        names = sorted(generate_labels(img_id, detail, out_dir)
                       for img_id in detail.getImgs())
        with open(osp.join(split_dir, f'{split}.txt'), 'w') as f:
            f.writelines(n + '\n' for n in names)
        print(f'{split}: {len(names)} images')
    print('Done!')


if __name__ == '__main__':
    main()
