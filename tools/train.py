#!/usr/bin/env python
"""Training CLI (ref contract: tools/train.py).

Single-controller JAX replaces torch.distributed.launch: run the same
command on every host (``jax.distributed.initialize`` picks up the cluster
env); there is no --launcher matrix.
"""

import argparse
import copy
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

# honor an explicit JAX_PLATFORMS env even where a site hook registers an
# accelerator at interpreter startup (the env var alone is ignored there;
# config.update works until the first backend use — see tests/conftest.py)
if os.environ.get('JAX_PLATFORMS'):
    import jax
    jax.config.update('jax_platforms', os.environ['JAX_PLATFORMS'])

from segdistill_tpu import Config, DictAction
from segdistill_tpu.apis import set_random_seed, train_segmentor
from segdistill_tpu.datasets import build_dataset
from segdistill_tpu.models import build_segmentor
from segdistill_tpu.utils import collect_env, get_root_logger


def parse_args():
    parser = argparse.ArgumentParser(description='Train a segmentor')
    parser.add_argument('config', help='train config file path')
    parser.add_argument('--work-dir', help='the dir to save logs and models')
    parser.add_argument('--load-from',
                        help='orbax checkpoint (work dir / checkpoints dir '
                             '/ step dir) for a weights-only warm start: '
                             'iteration counter and optimizer state stay '
                             'fresh (ref apis/train.py:134-135)')
    parser.add_argument('--resume-from',
                        help='checkpoint to resume (work dir / checkpoints '
                             'dir / step dir); full state incl. step and '
                             'optimizer. Fails loudly if not restorable')
    parser.add_argument('--no-validate', action='store_true')
    parser.add_argument('--seed', type=int, default=None)
    parser.add_argument('--deterministic', action='store_true',
                        help='accepted for reference CLI parity; a no-op '
                             'here — JAX training is deterministic by '
                             'default (explicit PRNG keys, per-sample '
                             'loader RNG streams)')
    parser.add_argument('--options', nargs='+', action=DictAction,
                        help='custom options: key=value')
    parser.add_argument('--multi-host', action='store_true',
                        help='call jax.distributed.initialize()')
    return parser.parse_args()


def main():
    args = parse_args()
    if args.multi_host:
        import jax
        jax.distributed.initialize()

    cfg = Config.fromfile(args.config)
    if args.options is not None:
        cfg.merge_from_dict(args.options)
    if args.work_dir is not None:
        cfg.work_dir = args.work_dir
    elif cfg.get('work_dir', None) is None:
        cfg.work_dir = osp.join('./work_dirs',
                                osp.splitext(osp.basename(args.config))[0])
    if args.resume_from is not None:
        cfg.resume_from = args.resume_from
    if args.load_from is not None:
        cfg.load_from = args.load_from
    if args.seed is not None:
        cfg.seed = args.seed

    os.makedirs(osp.abspath(cfg.work_dir), exist_ok=True)
    cfg.dump(osp.join(cfg.work_dir, osp.basename(args.config)))
    timestamp = time.strftime('%Y%m%d_%H%M%S', time.localtime())
    log_file = osp.join(cfg.work_dir, f'{timestamp}.log')
    logger = get_root_logger(log_file=log_file)

    env_info = '\n'.join(f'{k}: {v}' for k, v in collect_env().items())
    logger.info('Environment info:\n' + env_info)
    logger.info(f'Config:\n{cfg.pretty_text}')

    model = build_segmentor(dict(cfg.model),
                            train_cfg=cfg.get('train_cfg'),
                            test_cfg=cfg.get('test_cfg'))
    datasets = [build_dataset(cfg.data['train'])]

    train_segmentor(model, datasets, cfg, distributed=True,
                    validate=not args.no_validate, timestamp=timestamp)


if __name__ == '__main__':
    main()
