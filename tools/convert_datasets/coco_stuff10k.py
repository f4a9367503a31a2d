#!/usr/bin/env python
"""COCO-Stuff 10k annotation converter
(ref contract: tools/convert_datasets/coco_stuff10k.py).

Reads the .mat annotations, remaps raw category ids to contiguous
trainIds and writes ``*_labelTrainIds.png`` + copies images into
train2014/test2014 — matching the reference layout. The reference's
explicit 183-entry ``clsID_to_trID`` dict (:12-187) is 0 -> 0 plus the
contiguous rank of each present id; ids {12, 26, 29, 30, 45, 66, 68, 69,
71, 83, 91} are absent from COCO-Stuff (the 11 removed thing classes),
leaving 171 classes.
"""

import argparse
import os
import os.path as osp
import shutil

import numpy as np
from PIL import Image
from scipy.io import loadmat

COCO_LEN = 10000

_ABSENT = {12, 26, 29, 30, 45, 66, 68, 69, 71, 83, 91}
clsID_to_trID = {0: 0}
_tr = 1
for _cls in range(1, 183):
    if _cls in _ABSENT:
        continue
    clsID_to_trID[_cls] = _tr
    _tr += 1
assert max(clsID_to_trID.values()) == 171


def convert_to_trainID(tuple_path, in_img_dir, in_ann_dir, out_img_dir,
                       out_mask_dir, is_train):
    imgpath, maskpath = tuple_path
    sub = 'train2014' if is_train else 'test2014'
    shutil.copyfile(osp.join(in_img_dir, imgpath),
                    osp.join(out_img_dir, sub, imgpath))
    mask = loadmat(osp.join(in_ann_dir, maskpath))['S'].astype(np.uint8)
    mask_copy = mask.copy()
    for clsID, trID in clsID_to_trID.items():
        mask_copy[mask == clsID] = trID
    seg_filename = osp.join(
        out_mask_dir, sub, maskpath.split('.')[0] + '_labelTrainIds.png')
    Image.fromarray(mask_copy).save(seg_filename, 'PNG')


def generate_coco_list(folder):
    out = []
    for split in ('train', 'test'):
        paths = []
        with open(osp.join(folder, 'imageLists', f'{split}.txt')) as f:
            for line in f:
                base = line.strip()
                if base:
                    paths.append((base + '.jpg', base + '.mat'))
        out.append(paths)
    return out


def parse_args():
    parser = argparse.ArgumentParser(
        description='Convert COCO-Stuff 10k annotations')
    parser.add_argument('coco_path', help='coco stuff path')
    parser.add_argument('-o', '--out_dir', help='output path')
    return parser.parse_args()


def main():
    args = parse_args()
    coco_path = args.coco_path
    out_dir = args.out_dir or coco_path
    out_img_dir = osp.join(out_dir, 'images')
    out_mask_dir = osp.join(out_dir, 'annotations')
    for sub in ('train2014', 'test2014'):
        os.makedirs(osp.join(out_img_dir, sub), exist_ok=True)
        os.makedirs(osp.join(out_mask_dir, sub), exist_ok=True)

    train_paths, test_paths = generate_coco_list(coco_path)
    assert len(train_paths) + len(test_paths) == COCO_LEN, \
        f'expected {COCO_LEN} images, got ' \
        f'{len(train_paths)}+{len(test_paths)}'
    in_img_dir = osp.join(coco_path, 'images')
    in_ann_dir = osp.join(coco_path, 'annotations')
    for paths, is_train in ((train_paths, True), (test_paths, False)):
        for i, tp in enumerate(paths):
            convert_to_trainID(tp, in_img_dir, in_ann_dir, out_img_dir,
                               out_mask_dir, is_train)
            if (i + 1) % 1000 == 0:
                print(f'{"train" if is_train else "test"}: {i + 1} done')
    print('Done!')


if __name__ == '__main__':
    main()
