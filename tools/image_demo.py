#!/usr/bin/env python
"""Single-image demo (ref contract: demo/image_demo.py)."""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from segdistill_tpu.apis import (inference_segmentor, init_segmentor,
                                 show_result_pyplot)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('img', help='image file')
    parser.add_argument('config', help='config file')
    parser.add_argument('checkpoint', nargs='?', default=None)
    parser.add_argument('--out-file', default=None)
    parser.add_argument('--opacity', type=float, default=0.5)
    args = parser.parse_args()

    model, variables = init_segmentor(args.config, args.checkpoint)
    result = inference_segmentor(model, variables, args.img)
    out = args.out_file or 'demo_result.png'
    show_result_pyplot(model, args.img, result, opacity=args.opacity,
                       out_file=out)
    print(f'segmentation written to {out}')


if __name__ == '__main__':
    main()
