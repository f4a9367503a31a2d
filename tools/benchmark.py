#!/usr/bin/env python
"""Inference fps benchmark (ref contract: tools/benchmark.py:50-82).

``torch.cuda.synchronize`` becomes ``jax.block_until_ready``.
"""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import numpy as np

from segdistill_tpu import Config
from segdistill_tpu.apis.inference import init_segmentor


def parse_args():
    parser = argparse.ArgumentParser(description='benchmark fps')
    parser.add_argument('config')
    parser.add_argument('checkpoint', nargs='?', default=None)
    parser.add_argument('--log-interval', type=int, default=50)
    parser.add_argument('--iters', type=int, default=200)
    parser.add_argument('--warmup', type=int, default=5)
    parser.add_argument('--shape', type=int, nargs=2, default=[512, 512])
    return parser.parse_args()


def main():
    args = parse_args()
    cfg = Config.fromfile(args.config)
    model, variables = init_segmentor(
        cfg, args.checkpoint,
        input_shape=(1, args.shape[0], args.shape[1], 3))

    h, w = args.shape
    img = jax.device_put(np.random.randn(1, h, w, 3).astype(np.float32))

    # dispatches whole vs slide from the config's test_cfg (the reference
    # times the full inference path incl. slide windows, benchmark.py:64)
    fn = jax.jit(lambda v, x: model.inference(v, x))
    fn(variables, img).block_until_ready()  # compile

    total = 0.0
    for i in range(args.iters + args.warmup):
        t0 = time.perf_counter()
        fn(variables, img).block_until_ready()
        dt = time.perf_counter() - t0
        if i >= args.warmup:
            total += dt
            if (i + 1 - args.warmup) % args.log_interval == 0:
                done = i + 1 - args.warmup
                print(f'Done image [{done:3}/{args.iters}], '
                      f'fps: {done / total:.2f} img/s')
    print(f'Overall fps: {args.iters / total:.2f} img/s')


if __name__ == '__main__':
    main()
