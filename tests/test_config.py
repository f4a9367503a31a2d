"""Config system tests (ref strategy: tests/test_config.py)."""

import os.path as osp
import tempfile

import pytest

from segdistill_tpu import Config, DictAction


def _write(dirname, name, content):
    path = osp.join(dirname, name)
    with open(path, 'w') as f:
        f.write(content)
    return path


def test_base_inheritance_and_delete():
    with tempfile.TemporaryDirectory() as d:
        _write(d, 'base.py', (
            "optimizer = dict(type='SGD', lr=0.01, momentum=0.9)\n"
            "data = dict(samples_per_gpu=4, workers_per_gpu=2)\n"
            "x = 1\n"))
        child = _write(d, 'child.py', (
            "_base_ = ['./base.py']\n"
            "optimizer = dict(_delete_=True, type='AdamW', lr=6e-5)\n"
            "data = dict(samples_per_gpu=2)\n"))
        cfg = Config.fromfile(child)
        # _delete_ replaces wholesale
        assert cfg.optimizer == dict(type='AdamW', lr=6e-5)
        # plain dicts merge recursively
        assert cfg.data['samples_per_gpu'] == 2
        assert cfg.data['workers_per_gpu'] == 2
        assert cfg.x == 1


def test_merge_from_dict():
    cfg = Config(dict(model=dict(backbone=dict(type='mit_b0')), lr=0.1))
    cfg.merge_from_dict({'model.backbone.type': 'mit_b1', 'lr': 0.2})
    assert cfg.model['backbone']['type'] == 'mit_b1'
    assert cfg.lr == 0.2


def test_duplicate_base_keys_raise():
    with tempfile.TemporaryDirectory() as d:
        _write(d, 'a.py', 'x = 1\n')
        _write(d, 'b.py', 'x = 2\n')
        child = _write(d, 'c.py', "_base_ = ['./a.py', './b.py']\n")
        with pytest.raises(KeyError):
            Config.fromfile(child)


def test_dict_action():
    import argparse
    parser = argparse.ArgumentParser()
    parser.add_argument('--options', nargs='+', action=DictAction)
    args = parser.parse_args(
        ['--options', 'a.b=2', 'c=true', 'd=1,2,3', 'e=hi'])
    assert args.options == {'a.b': 2, 'c': True, 'd': (1, 2, 3), 'e': 'hi'}


def test_attribute_access_and_dump():
    cfg = Config(dict(a=dict(b=[1, 2])))
    assert cfg.a['b'] == [1, 2]
    text = cfg.dump()
    assert 'a =' in text
