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


MODEL_BASES = sorted(glob.glob(osp.join(CFG_ROOT, '_base_', 'models',
                                        '*.py')))
REF_MODEL_BASES = '/root/reference/local_configs/_base_/models'
REF_LOCAL_CONFIGS = '/root/reference/local_configs'


def test_base_models_corpus_complete():
    """All 29 reference model fragments ship as declarative configs
    (ref local_configs/_base_/models/)."""
    names = {osp.basename(p) for p in MODEL_BASES}
    expected = {
        'ann_r50-d8.py', 'apcnet_r50-d8.py', 'ccnet_r50-d8.py', 'cgnet.py',
        'danet_r50-d8.py', 'deeplabv3_r50-d8.py', 'deeplabv3_unet_s5-d16.py',
        'deeplabv3plus_r50-d8.py', 'dmnet_r50-d8.py', 'dnl_r50-d8.py',
        'emanet_r50-d8.py', 'encnet_r50-d8.py', 'fast_scnn.py',
        'fcn_hr18.py', 'fcn_r50-d8.py', 'fcn_unet_s5-d16.py', 'fpn_r50.py',
        'gcnet_r50-d8.py', 'lraspp_m-v3-d8.py', 'nonlocal_r50-d8.py',
        'ocrnet_hr18.py', 'ocrnet_r50-d8.py', 'pointrend_r50.py',
        'psanet_r50-d8.py', 'pspnet_r50-d8.py', 'pspnet_unet_s5-d16.py',
        'segformer.py', 'upernet_r50.py', 'upernet_swin.py'}
    assert expected <= names, expected - names


def test_base_models_match_generator():
    """The checked-in fragments are exactly the generator's output."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'gen_base_models',
        osp.join(osp.dirname(CFG_ROOT), 'tools', 'gen_base_models.py'))
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)
    for name, model in gen.fragments().items():
        path = osp.join(gen.OUT_DIR, name)
        assert osp.exists(path), name
        assert open(path).read() == gen.render(name, model), (
            f'{name} is stale; rerun tools/gen_base_models.py')


@pytest.mark.parametrize('frag_path', MODEL_BASES,
                         ids=[osp.basename(p) for p in MODEL_BASES])
def test_base_model_fragment_builds(frag_path):
    cfg = Config.fromfile(frag_path)
    model_cfg = dict(cfg.model)
    _strip_pretrained(model_cfg)
    model = build_segmentor(model_cfg)
    assert model.num_classes in (2, 19)


def _norm(obj):
    """Normalize for dict comparison: tuples == lists, ConfigDict == dict."""
    if isinstance(obj, dict):
        return {k: _norm(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_norm(v) for v in obj]
    return obj


@pytest.mark.skipif(not osp.isdir(REF_MODEL_BASES),
                    reason='reference tree not available')
@pytest.mark.parametrize('frag_path', MODEL_BASES,
                         ids=[osp.basename(p) for p in MODEL_BASES])
def test_base_model_fragments_match_reference(frag_path):
    """Fragment model dicts equal the reference's, modulo the documented
    deltas (tools/gen_base_models.py): dropped 'open-mmlab://' pretrained
    URIs and segformer.py's nonexistent-in-reference 'IMTRv21_5' backbone
    type (we default it to mit_b5)."""
    name = osp.basename(frag_path)
    ref = _norm(dict(Config.fromfile(
        osp.join(REF_MODEL_BASES, name)).model))
    ours = _norm(dict(Config.fromfile(frag_path).model))
    ref.pop('pretrained', None)
    ours.pop('pretrained', None)
    if name == 'segformer.py':
        assert ref['backbone'].pop('type') == 'IMTRv21_5'
        assert ours['backbone'].pop('type') == 'mit_b5'
    assert ours == ref


REF_EXPERIMENT_CONFIGS = sorted(
    glob.glob(osp.join(REF_LOCAL_CONFIGS, 'exp_tab5', '*.py'))
    + glob.glob(osp.join(REF_LOCAL_CONFIGS, 'Group_Size', '*.py'))
    + glob.glob(osp.join(REF_LOCAL_CONFIGS, 'Weight_Temperature', '*.py'))
    + glob.glob(osp.join(REF_LOCAL_CONFIGS, 'Teacher_Student_Size', '*.py'))
    + glob.glob(osp.join(REF_LOCAL_CONFIGS, 'segformer', 'B*', '*.py')))


@pytest.mark.skipif(not osp.isdir(REF_LOCAL_CONFIGS),
                    reason='reference tree not available')
@pytest.mark.parametrize(
    'config_path', REF_EXPERIMENT_CONFIGS,
    ids=[osp.relpath(p, REF_LOCAL_CONFIGS) for p in REF_EXPERIMENT_CONFIGS])
def test_reference_config_drops_in(config_path):
    """A reference experiment config file loads VERBATIM from the reference
    tree (its _base_ chain included) and its model dict builds — the only
    edits a user needs are checkpoint paths (stripped here since no .pth
    zoo ships in this image)."""
    cfg = Config.fromfile(config_path)
    model_cfg = dict(cfg.model)
    _strip_pretrained(model_cfg)
    model = build_segmentor(model_cfg)
    assert model.num_classes in (19, 150)
    assert cfg.optimizer['type'] in ('AdamW', 'SGD')


def test_reference_corpus_enumeration():
    if not osp.isdir(REF_LOCAL_CONFIGS):
        pytest.skip('reference tree not available')
    assert len(REF_EXPERIMENT_CONFIGS) == 64


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
