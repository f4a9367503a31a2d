#!/usr/bin/env python
"""Retina-vessel dataset converters: CHASE_DB1 / DRIVE / HRF / STARE
(ref contracts: tools/convert_datasets/{chase_db1,drive,hrf,stare}.py).

One script, ``--dataset`` selects the layout. Extracts the official
archives and binarizes annotations to {0 background, 1 vessel}.
"""

import argparse
import os
import os.path as osp
import sys
import zipfile

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))
from segdistill_tpu.utils import image as imutil

SPLITS = {  # dataset -> (num_train, ann suffix predicate)
    'chase_db1': 8,
    'drive': 20,
    'hrf': 15,
    'stare': 10,
}


def _extract(archive, out):
    if archive.endswith('.zip'):
        with zipfile.ZipFile(archive) as z:
            z.extractall(out)
    else:
        import tarfile
        with tarfile.open(archive) as t:
            t.extractall(out)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('dataset', choices=sorted(SPLITS))
    parser.add_argument('images', help='image archive or directory')
    parser.add_argument('annotations', help='annotation archive or dir')
    parser.add_argument('-o', '--out_dir', required=True)
    args = parser.parse_args()

    tmp = osp.join(args.out_dir, '_raw')
    for src, sub in [(args.images, 'img'), (args.annotations, 'ann')]:
        dst = osp.join(tmp, sub)
        os.makedirs(dst, exist_ok=True)
        if osp.isdir(src):
            for f in os.listdir(src):
                os.symlink(osp.abspath(osp.join(src, f)),
                           osp.join(dst, f))
        else:
            _extract(src, dst)

    def collect(d, exts):
        out = []
        for root, _, files in os.walk(d):
            out += [osp.join(root, f) for f in files
                    if f.lower().endswith(exts)]
        return sorted(out)

    imgs = collect(osp.join(tmp, 'img'),
                   ('.jpg', '.png', '.tif', '.ppm', '.gif'))
    anns = collect(osp.join(tmp, 'ann'),
                   ('.png', '.tif', '.gif', '.ppm', '.ah'))
    assert imgs and len(imgs) == len(anns), (len(imgs), len(anns))

    n_train = SPLITS[args.dataset]
    for split_start, split in [(0, 'training'), (n_train, 'validation')]:
        os.makedirs(osp.join(args.out_dir, 'images', split), exist_ok=True)
        os.makedirs(osp.join(args.out_dir, 'annotations', split),
                    exist_ok=True)
    for i, (im, an) in enumerate(zip(imgs, anns)):
        split = 'training' if i < n_train else 'validation'
        name = f'{osp.splitext(osp.basename(im))[0]}.png'
        img = imutil.imread(im)
        imutil.imwrite(img, osp.join(args.out_dir, 'images', split, name))
        ann = imutil.imread(an, flag='grayscale')
        ann = (ann > 127).astype(np.uint8)  # binarize to {0,1}
        imutil.imwrite(ann, osp.join(args.out_dir, 'annotations', split,
                                     name))
    print(f'{args.dataset}: wrote {len(imgs)} image/annotation pairs '
          f'({n_train} train)')


if __name__ == '__main__':
    main()
