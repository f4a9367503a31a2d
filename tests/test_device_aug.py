"""On-device fused augmentation tests."""

import jax
import numpy as np
import pytest

from segdistill_tpu.data import DeviceAugPipeline, PrepareCanvas

# compile-heavy on the 1-core CI box -> slow tier (fast tier = <3 min signal)
pytestmark = pytest.mark.slow


def _canvas_batch(b=2, ch=64, cw=128, vh=48, vw=96, seed=0):
    rng = np.random.RandomState(seed)
    img = np.zeros((b, ch, cw, 3), np.uint8)
    gt = np.full((b, ch, cw), 255, np.uint8)
    img[:, :vh, :vw] = rng.randint(0, 255, (b, vh, vw, 3))
    gt[:, :vh, :vw] = rng.randint(0, 6, (b, vh, vw))
    valid = np.tile(np.array([[vh, vw]], np.int32), (b, 1))
    return img, gt, valid


def test_shapes_and_ranges():
    aug = DeviceAugPipeline(crop_size=(32, 32), num_classes=8)
    img, gt, valid = _canvas_batch()
    out_img, out_gt = aug(jax.random.key(0), img, gt, valid)
    assert out_img.shape == (2, 32, 32, 3)
    assert out_gt.shape == (2, 32, 32)
    out_gt = np.asarray(out_gt)
    assert set(np.unique(out_gt)).issubset(set(range(8)) | {255})
    # normalized image roughly zero-centered
    assert abs(float(np.asarray(out_img).mean())) < 3.0


def test_deterministic_per_key():
    aug = DeviceAugPipeline(crop_size=(32, 32), num_classes=8)
    img, gt, valid = _canvas_batch()
    a = aug(jax.random.key(7), img, gt, valid)
    b = aug(jax.random.key(7), img, gt, valid)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    c = aug(jax.random.key(8), img, gt, valid)
    assert not np.array_equal(np.asarray(a[0]), np.asarray(c[0]))


def test_cat_max_ratio_prefers_diverse_crops():
    """Left half = class 0 only, right half mixed: with cat_max_ratio the
    picked crops should mostly be diverse."""
    b = 8
    img = np.zeros((b, 64, 128, 3), np.uint8)
    gt = np.zeros((b, 64, 128), np.uint8)
    gt[:, :, 64:] = np.random.RandomState(0).randint(1, 6, (b, 64, 64))
    valid = np.tile(np.array([[64, 128]], np.int32), (b, 1))
    aug = DeviceAugPipeline(crop_size=(32, 32), ratio_range=(1.0, 1.0),
                            cat_max_ratio=0.75, num_classes=8,
                            flip_prob=0.0)
    _, out_gt = aug(jax.random.key(3), img, gt, valid)
    out_gt = np.asarray(out_gt)
    diverse = 0
    for i in range(b):
        vals, cnt = np.unique(out_gt[i][out_gt[i] != 255],
                              return_counts=True)
        if len(cnt) > 1 and cnt.max() / cnt.sum() < 0.9:
            diverse += 1
    assert diverse >= b // 2


def test_prepare_canvas():
    rng = np.random.RandomState(1)
    results = dict(img=rng.randint(0, 255, (100, 160, 3), np.uint8),
                   gt_semantic_seg=rng.randint(0, 6, (100, 160), np.uint8))
    prep = PrepareCanvas(img_scale=(128, 64), canvas=(64, 128))
    out = prep(results)
    assert out['img'].shape == (64, 128, 3)
    assert out['gt_semantic_seg'].shape == (64, 128)
    vh, vw = out['valid_hw']
    assert vh <= 64 and vw <= 128
    # padded region carries the seg pad value
    assert (out['gt_semantic_seg'][vh:, :] == 255).all()


def test_hsv_roundtrip():
    from segdistill_tpu.data.device_aug import _rgb_to_hsv, _hsv_to_rgb
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(0, 255, (16, 16, 3)).astype(np.float32))
    y = _hsv_to_rgb(_rgb_to_hsv(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=0.5)
