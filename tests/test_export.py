"""jax.export serving path (tools/export_stablehlo.py — the reference's
pytorch2onnx.py:19-146 role): export, serialize, deserialize, and check
the round-tripped artifact computes the same maps."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from segdistill_tpu.models import build_segmentor

# compile-heavy on the 1-core CI box -> slow tier (fast tier = <3 min signal)
pytestmark = pytest.mark.slow


def _tiny_cfg():
    return dict(
        type='EncoderDecoder',
        backbone=dict(type='ResNet', depth=18, num_stages=4,
                      out_indices=(0, 1, 2, 3), norm_cfg=dict(type='BN')),
        decode_head=dict(type='FCNHead', in_channels=512, in_index=3,
                         channels=16, num_convs=1, concat_input=False,
                         dropout_ratio=0.0, num_classes=5,
                         norm_cfg=dict(type='BN'), align_corners=False),
        test_cfg=dict(mode='whole'))


def test_export_roundtrip(tmp_path):
    import sys
    import os.path as osp
    sys.path.insert(0, osp.join(osp.dirname(osp.dirname(
        osp.abspath(__file__))), 'tools'))
    from export_stablehlo import export_model

    model = build_segmentor(_tiny_cfg())
    variables = model.init_variables(jax.random.key(0), (1, 32, 32, 3))

    exp = export_model(model, variables, (1, 32, 32, 3))
    data = exp.serialize()
    assert len(data) > 1000

    from jax import export as jexport
    back = jexport.deserialize(data)
    img = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3),
                      jnp.float32)
    got = np.asarray(back.call(img))
    want = np.asarray(jnp.argmax(model.encode_decode(variables, img),
                                 axis=-1).astype(jnp.int32))
    np.testing.assert_array_equal(got, want)
    assert got.shape == (1, 32, 32)
