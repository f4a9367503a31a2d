"""Every shipped config must load and build its segmentor
(ref strategy: tests/test_config.py:26-59)."""

import glob
import os.path as osp

import pytest

from segdistill_tpu import Config
from segdistill_tpu.models import build_segmentor

pytestmark = pytest.mark.slow

CFG_ROOT = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                    'configs')
ALL_CONFIGS = sorted(
    p for p in glob.glob(osp.join(CFG_ROOT, '**', '*.py'), recursive=True)
    if '_base_' not in p)


def _strip_pretrained(cfg):
    if isinstance(cfg, dict):
        for key in ('pretrained', 't_pretrain', 's_pretrain'):
            if key in cfg:
                cfg[key] = None
        for v in cfg.values():
            _strip_pretrained(v)
    elif isinstance(cfg, (list, tuple)):
        for v in cfg:
            _strip_pretrained(v)


def test_corpus_is_complete():
    # the reference's experiment matrix: 21 tab5 + 6 group-size +
    # 12 alpha/tau + 10 scale pairs + 6 segformer recipes
    names = [osp.relpath(p, CFG_ROOT) for p in ALL_CONFIGS]
    assert sum(n.startswith('exp_tab5/') for n in names) == 21
    assert sum(n.startswith('group_size/') for n in names) == 6
    assert sum(n.startswith('weight_temperature/') for n in names) == 12
    assert sum(n.startswith('teacher_student_size/') for n in names) == 10
    assert sum(n.startswith('segformer/') for n in names) == 6


@pytest.mark.parametrize('config_path', ALL_CONFIGS,
                         ids=[osp.relpath(p, CFG_ROOT) for p in ALL_CONFIGS])
def test_config_builds(config_path):
    cfg = Config.fromfile(config_path)
    assert 'model' in cfg
    model_cfg = dict(cfg.model)
    _strip_pretrained(model_cfg)
    model = build_segmentor(model_cfg, train_cfg=cfg.get('train_cfg'),
                            test_cfg=cfg.get('test_cfg'))
    assert cfg.optimizer['type'] in ('AdamW', 'SGD')
    if osp.relpath(config_path, CFG_ROOT).startswith('extra' + osp.sep):
        # extras (pointrend/psanet/cityscapes-slide) set their own
        # dataset/schedule; just require a consistent build
        assert model.num_classes in (19, 150)
        return
    assert model.num_classes == 150
    # the KD-matrix training recipe keys exist
    assert cfg.runner['max_iters'] == 160000
    assert cfg.data['train']['type'] == 'RepeatDataset'
