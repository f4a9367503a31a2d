#!/usr/bin/env python
"""Convert torch ``.pth`` zoo checkpoints into this framework's orbax format
(plays the role of tools/mit_converter.py + tools/convert_model.py +
mmcv_custom/checkpoint.py in the reference).

Examples:
    python tools/convert_checkpoint.py <cfg.py> teacher.pth out_dir/
    python tools/convert_checkpoint.py <cfg.py> mit_b0.pth out_dir/ \
        --backbone-only
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax

from segdistill_tpu import Config
from segdistill_tpu.convert import load_pth_into_variables
from segdistill_tpu.models import build_segmentor


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument('config', help='config describing the target model')
    parser.add_argument('pth', help='torch checkpoint')
    parser.add_argument('out', help='orbax output dir')
    parser.add_argument('--backbone-only', action='store_true')
    parser.add_argument('--role', choices=['model', 'student', 'teacher'],
                        default='model')
    parser.add_argument('--shape', type=int, nargs=2, default=[512, 512])
    return parser.parse_args()


def main():
    args = parse_args()
    cfg = Config.fromfile(args.config)
    model_cfg = dict(cfg.model)
    if model_cfg.get('type') in ('SDModule', 'SDModuleMT') \
            and args.role != 'model':
        model_cfg = dict(model_cfg['cfg_s' if args.role == 'student'
                                   else 'cfg_t'])
    model_cfg.pop('pretrained', None)
    model = build_segmentor(model_cfg, train_cfg=dict(),
                            test_cfg=dict(mode='whole'))
    variables = model.init_variables(
        jax.random.key(0), (1, args.shape[0], args.shape[1], 3))
    variables = load_pth_into_variables(
        variables, args.pth, model, strict=False,
        backbone_only=args.backbone_only)

    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(osp.abspath(args.out), variables)
    ckptr.wait_until_finished()
    print(f'saved converted variables to {args.out}')


if __name__ == '__main__':
    main()
