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


DATASET_BASES = sorted(glob.glob(osp.join(
    osp.dirname(CFG_ROOT) if CFG_ROOT.endswith(osp.sep) else CFG_ROOT,
    '_base_', 'datasets', '*.py')))


def test_dataset_base_corpus_complete():
    """All 15 reference dataset bases ship (ref local_configs/_base_/
    datasets/: ade20k x2, cityscapes x4, mapillary x2, voc12 x2,
    pascal_context, chase_db1, drive, hrf, stare)."""
    names = {osp.basename(p) for p in DATASET_BASES}
    expected = {
        'ade20k.py', 'ade20k_repeat.py', 'cityscapes.py',
        'cityscapes_repeat.py', 'cityscapes_768x768_repeat.py',
        'cityscapes_1024x1024_repeat.py', 'mapillary_768x768_repeat.py',
        'mapillary_1024x1024_repeat.py', 'pascal_voc12.py',
        'pascal_voc12_aug.py', 'pascal_context.py', 'chase_db1.py',
        'drive.py', 'hrf.py', 'stare.py'}
    assert expected <= names, expected - names


@pytest.mark.parametrize('base_path', DATASET_BASES,
                         ids=[osp.basename(p) for p in DATASET_BASES])
def test_dataset_base_pipelines_build(base_path):
    from segdistill_tpu.datasets.pipelines import Compose
    cfg = Config.fromfile(base_path)
    train = cfg['data']['train']
    inner = train.get('dataset', train)
    Compose(inner['pipeline'])
    Compose(cfg['data']['val']['pipeline'])
    assert cfg['data']['samples_per_gpu'] >= 1
