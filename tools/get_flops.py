#!/usr/bin/env python
"""Model complexity report (ref contract: tools/get_flops.py).

The reference sums per-module analytic FLOPs with a hand-written correction
for SRA attention (get_flops.py:22-31). Here the *compiled XLA program's*
cost analysis is the source of truth — it covers every op, including the
attention einsums, for free.
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from segdistill_tpu import Config
from segdistill_tpu.models import build_segmentor


def parse_args():
    parser = argparse.ArgumentParser(description='model complexity')
    parser.add_argument('config')
    parser.add_argument('--shape', type=int, nargs='+', default=[512, 512])
    return parser.parse_args()


def main():
    args = parse_args()
    h, w = (args.shape * 2)[:2]
    cfg = Config.fromfile(args.config)
    model_cfg = dict(cfg.model)
    if model_cfg.get('type') == 'SDModule':
        model_cfg = dict(model_cfg['cfg_s'])  # student complexity
    model_cfg.pop('pretrained', None)
    model = build_segmentor(model_cfg, train_cfg=dict(),
                            test_cfg=dict(mode='whole'))
    variables = model.init_variables(jax.random.key(0), (1, h, w, 3))

    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree.leaves(variables['params']))

    fn = jax.jit(lambda v, x: model.encode_decode(v, x))
    compiled = fn.lower(variables, jnp.zeros((1, h, w, 3))).compile()
    cost = compiled.cost_analysis()
    flops = cost.get('flops', float('nan'))

    sep = '=' * 60
    print(sep)
    print(f'Input shape: (1, {h}, {w}, 3)')
    print(f'Params: {n_params / 1e6:.2f} M')
    print(f'FLOPs (XLA cost analysis, fwd): {flops / 1e9:.2f} G')
    if 'bytes accessed' in cost:
        print(f'HBM bytes accessed: {cost["bytes accessed"] / 1e9:.2f} GB')
    print(sep)


if __name__ == '__main__':
    main()
