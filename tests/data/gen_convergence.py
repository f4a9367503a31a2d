#!/usr/bin/env python
"""Generator for the committed miniature convergence dataset
(tests/data/convergence/). Deterministic; committed for provenance — the
images themselves are checked in so the convergence artifact
(tests/test_convergence.py, docs/convergence.md) runs on a fixed corpus.

Structure: 64x64 images tiled 2x2 with 32^2 patches; each patch carries a
class-specific base color + per-pixel noise, its label = the class id
(1..4). A 2-px frame is labeled 0 = unlabeled (ADE-style
reduce_zero_label: 0 -> ignored, 1..4 -> classes 0..3). Color <-> class
is deterministic, so a segmentor must (and quickly can) learn the
mapping — mIoU well above the 25% 4-class chance within a few hundred
iterations.
"""

import os
import os.path as osp

import numpy as np

BASE = {1: (200, 40, 40), 2: (40, 180, 40), 3: (40, 60, 200),
        4: (210, 200, 50)}


def make(root):
    import cv2
    rs = np.random.RandomState(1234)
    for split, n in (('train', 16), ('val', 4)):
        os.makedirs(osp.join(root, 'img', split), exist_ok=True)
        os.makedirs(osp.join(root, 'ann', split), exist_ok=True)
        for i in range(n):
            img = np.zeros((64, 64, 3), np.float32)
            ann = np.zeros((64, 64), np.uint8)
            for ty in range(2):
                for tx in range(2):
                    cls = int(rs.randint(1, 5))
                    sl = (slice(ty * 32, (ty + 1) * 32),
                          slice(tx * 32, (tx + 1) * 32))
                    img[sl] = BASE[cls]
                    ann[sl] = cls
            img += rs.randn(64, 64, 3) * 12
            ann[:2], ann[-2:], ann[:, :2], ann[:, -2:] = 0, 0, 0, 0
            img_u8 = np.clip(img, 0, 255).astype(np.uint8)
            cv2.imwrite(osp.join(root, 'img', split, f's{i}.jpg'),
                        img_u8[..., ::-1],  # RGB -> BGR for cv2
                        [cv2.IMWRITE_JPEG_QUALITY, 95])
            cv2.imwrite(osp.join(root, 'ann', split, f's{i}.png'), ann)


if __name__ == '__main__':
    make(osp.join(osp.dirname(osp.abspath(__file__)), 'convergence'))
    print('written')
