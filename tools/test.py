#!/usr/bin/env python
"""Evaluation CLI (ref contract: tools/test.py)."""

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

# honor an explicit JAX_PLATFORMS env even where a site hook registers an
# accelerator at interpreter startup (see tools/train.py)
if os.environ.get('JAX_PLATFORMS'):
    import jax
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])

from segdistill_tpu import Config, DictAction
from segdistill_tpu.apis import fast_evaluate, single_device_test
from segdistill_tpu.apis.inference import init_segmentor
from segdistill_tpu.datasets import build_dataset
from segdistill_tpu.utils import get_root_logger


def parse_args():
    parser = argparse.ArgumentParser(description='Test a segmentor')
    parser.add_argument('config')
    parser.add_argument('checkpoint', nargs='?', default=None,
                        help='.pth (torch zoo) or orbax work dir')
    parser.add_argument('--eval', type=str, nargs='+', default=['mIoU'])
    parser.add_argument('--aug-test', action='store_true',
                        help='multi-scale + flip TTA')
    parser.add_argument('--show-dir', help='dir to save painted results')
    parser.add_argument('--options', nargs='+', action=DictAction)
    parser.add_argument('--multi-host', action='store_true',
                        help='call jax.distributed.initialize() and use '
                             'the sharded fast_evaluate path')
    return parser.parse_args()


def main():
    args = parse_args()
    if args.multi_host:
        import jax
        jax.distributed.initialize()
    cfg = Config.fromfile(args.config)
    if args.options is not None:
        cfg.merge_from_dict(args.options)

    if args.aug_test:
        # the reference hardcodes per-dataset ratios (tools/test.py:90-108)
        pipe = cfg.data['test']['pipeline'][1]
        pipe['img_ratios'] = [0.5, 0.75, 1.0, 1.25, 1.5, 1.75]
        pipe['flip'] = True

    logger = get_root_logger()
    # init at a small spatial shape: params are shape-independent, and a
    # 512^2 student+teacher init is minutes of eager compute on a 1-core
    # CPU host
    model, variables = init_segmentor(cfg, args.checkpoint,
                                      input_shape=(1, 64, 64, 3))
    dataset = build_dataset(cfg.data['test'], dict(test_mode=True))

    # CLASSES/PALETTE from the checkpoint meta, falling back to the
    # dataset (ref tools/test.py:131-135)
    meta = None
    if args.checkpoint and osp.isdir(args.checkpoint):
        from segdistill_tpu.engine import load_meta
        meta = load_meta(args.checkpoint)
    if meta and meta.get('CLASSES'):
        model.CLASSES = meta['CLASSES']
        model.PALETTE = meta.get('PALETTE')
        logger.info(f'CLASSES/PALETTE read from checkpoint meta '
                    f'({len(model.CLASSES)} classes)')
    else:
        if args.checkpoint and osp.isdir(args.checkpoint):
            logger.warning('checkpoint has no meta; using the config-built '
                           'dataset CLASSES/PALETTE')
        model.CLASSES = dataset.CLASSES
        model.PALETTE = dataset.PALETTE

    if args.multi_host:
        # every host evaluates its shard; mIoU reduces via histogram psum
        metrics = fast_evaluate(model, variables, dataset,
                                metric=args.eval[0])
    else:
        results = single_device_test(model, variables, dataset)
        metrics = dataset.evaluate(results, metric=args.eval[0],
                                   logger=logger)
    logger.info(f'Eval results: {metrics}')
    print(metrics)


if __name__ == '__main__':
    main()
