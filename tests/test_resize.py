"""Golden tests: ops.resize vs torch F.interpolate (the reference's
resize substrate, mmseg/ops/wrappers.py:8-29)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from segdistill_tpu.ops import resize, resize_nchw


@pytest.mark.parametrize('mode,align', [('bilinear', False),
                                        ('bilinear', True),
                                        ('nearest', False)])
@pytest.mark.parametrize('in_hw,out_hw', [((8, 12), (16, 24)),
                                          ((16, 16), (7, 5)),
                                          ((10, 10), (10, 10)),
                                          ((5, 7), (32, 32))])
def test_resize_matches_torch(mode, align, in_hw, out_hw):
    rng = np.random.RandomState(0)
    x = rng.randn(2, in_hw[0], in_hw[1], 3).astype(np.float32)
    kwargs = {} if mode == 'nearest' else {'align_corners': align}
    ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                        size=out_hw, mode=mode, **kwargs)
    ref = ref.numpy().transpose(0, 2, 3, 1)
    got = np.asarray(resize(x, size=out_hw, mode=mode,
                            align_corners=align if mode != 'nearest'
                            else False))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_resize_nchw_roundtrip():
    x = np.random.RandomState(1).randn(1, 4, 8, 8).astype(np.float32)
    out = np.asarray(resize_nchw(x, size=(16, 16), mode='bilinear',
                                 align_corners=False))
    assert out.shape == (1, 4, 16, 16)


def test_scale_factor():
    x = np.zeros((1, 8, 8, 1), np.float32)
    out = resize(x, scale_factor=2.0, mode='nearest')
    assert out.shape == (1, 16, 16, 1)
