"""Optimizer/schedule/train-step tests incl. the 8-device CPU mesh
(the TPU-native counterpart of the reference's mocked DistEvalHook tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segdistill_tpu.engine import (build_lr_schedule, build_optimizer,
                                   build_train_step, create_train_state,
                                   paramwise_labels)
from segdistill_tpu.models import build_segmentor
from segdistill_tpu.parallel import create_mesh, replicate, shard_batch

# compile-heavy on the 1-core CI box -> slow tier (fast tier = <3 min signal)
pytestmark = pytest.mark.slow

NORM = dict(type='SyncBN', requires_grad=True)


def test_paramwise_custom_keys_substring_semantics():
    params = {
        'backbone': {'block1_0': {'norm1': {'scale': jnp.ones(4)},
                                  'attn': {'q': {'kernel': jnp.ones((4, 4))}}}},
        'decode_head': {'linear_pred': {'kernel': jnp.ones((4, 4))},
                        'linear_fuse': {'bn': {'bn': {'scale': jnp.ones(4)}}}},
    }
    custom_keys = {'pos_block': dict(decay_mult=0.0),
                   'norm': dict(decay_mult=0.0),
                   'head': dict(lr_mult=10.0)}
    labels = paramwise_labels(params, custom_keys)
    flat = {'.'.join(k): v for k, v in labels.items()}
    # LayerNorm in backbone -> 'norm' wins: decay 0
    assert flat['backbone.block1_0.norm1.scale'] == (1.0, 0.0)
    # plain backbone weight -> defaults
    assert flat['backbone.block1_0.attn.q.kernel'] == (1.0, 1.0)
    # decode head (incl. its BN, which has no 'norm' in the path — matching
    # the torch layout) -> 'head' wins: lr x10, decay 1
    assert flat['decode_head.linear_pred.kernel'] == (10.0, 1.0)
    assert flat['decode_head.linear_fuse.bn.bn.scale'] == (10.0, 1.0)


def test_poly_warmup_schedule():
    sched = build_lr_schedule(
        dict(policy='poly', warmup='linear', warmup_iters=1500,
             warmup_ratio=1e-6, power=1.0, min_lr=0.0),
        base_lr=6e-5, max_iters=160000)
    assert float(sched(0)) == pytest.approx(6e-5 * 1e-6, rel=1e-3)
    assert float(sched(750)) == pytest.approx(6e-5 * 0.5, rel=1e-2)
    assert float(sched(1500)) == pytest.approx(
        6e-5 * (1 - 1500 / 160000), rel=1e-4)
    assert float(sched(160000)) == pytest.approx(0.0, abs=1e-12)


def test_adamw_decay_direction():
    params = {'w': jnp.ones(4), 'norm_w': jnp.ones(4)}
    tx = build_optimizer(
        dict(type='AdamW', lr=0.1, betas=(0.9, 0.999), weight_decay=0.5,
             paramwise_cfg=dict(custom_keys={'norm': dict(decay_mult=0.)})),
        params)
    state = tx.init(params)
    grads = {'w': jnp.zeros(4), 'norm_w': jnp.zeros(4)}
    updates, _ = tx.update(grads, state, params)
    import optax
    new = optax.apply_updates(params, updates)
    # zero grads: only decay acts; norm_w must be untouched
    assert float(new['w'][0]) < 1.0
    assert float(new['norm_w'][0]) == pytest.approx(1.0)


def _sd_cfg():
    def enc(bb, in_ch, embed):
        return dict(type='EncoderDecoder',
                    backbone=dict(type=bb, style='pytorch'),
                    decode_head=dict(
                        type='SegFormerHead', in_channels=in_ch,
                        in_index=[0, 1, 2, 3],
                        feature_strides=[4, 8, 16, 32], channels=128,
                        dropout_ratio=0.1, num_classes=19, norm_cfg=NORM,
                        align_corners=False,
                        decoder_params=dict(embed_dim=embed)))
    return dict(type='SDModule', cfg_s=enc('mit_b0', [32, 64, 160, 256], 64),
                cfg_t=enc('mit_b1', [64, 128, 320, 512], 64),
                distillation=[{
                    'student_layer': 'decode_head.linear_pred',
                    'teacher_layer': 'decode_head.linear_pred',
                    'loss_name': 'CGDLoss',
                    'loss_config': {'group_size': 10, 'alpha': 3, 'tau': 2},
                }],
                train_cfg=dict(), test_cfg=dict(mode='whole'))


def test_distill_train_step_on_mesh():
    """Full distillation train step over an 8-device data mesh: the
    TPU-native replacement for DDP+SyncBN (SURVEY §2.10)."""
    if len(jax.devices()) < 2:
        pytest.skip('needs the multi-device CPU platform')
    model = build_segmentor(_sd_cfg())
    variables = model.init_variables(jax.random.key(0), (1, 32, 32, 3))

    # no warmup: the first-step update must be visibly nonzero
    lr_sched = build_lr_schedule(dict(policy='poly', power=1.0), 6e-5, 100)
    tx = build_optimizer(
        dict(type='AdamW', lr=6e-5, betas=(0.9, 0.999), weight_decay=0.01,
             paramwise_cfg=dict(custom_keys={
                 'norm': dict(decay_mult=0.), 'head': dict(lr_mult=10.)})),
        variables['student']['params'], lr_sched)
    state = create_train_state(jax.random.key(1), variables['student'], tx)

    mesh = create_mesh()
    state = replicate(state, mesh)
    teacher_vars = replicate(variables['teacher'], mesh)
    step_fn = build_train_step(model, tx, lr_sched, donate=False)

    n = len(jax.devices())
    batch = {
        'img': np.random.RandomState(0).randn(n, 32, 32, 3).astype(
            np.float32),
        'gt': np.random.RandomState(1).randint(
            0, 19, (n, 32, 32)).astype(np.int32),
    }
    device_batch = shard_batch(batch, mesh)
    new_state, log_vars = step_fn(state, teacher_vars,
                                  device_batch['img'], device_batch['gt'])
    assert int(new_state.step) == 1
    assert np.isfinite(float(log_vars['loss']))
    assert 'decode.loss_seg' in log_vars
    distill_keys = [k for k in log_vars if 'linear_pred' in k]
    assert len(distill_keys) == 1
    # params actually changed
    p0 = jax.tree.leaves(state.params)[0]
    p1 = jax.tree.leaves(new_state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_syncbn_matches_global_batch():
    """BN stats under the sharded mesh must equal single-device global-batch
    stats — the SyncBN parity claim."""
    if len(jax.devices()) < 2:
        pytest.skip('needs the multi-device CPU platform')
    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9)(x)

    m = M()
    n = len(jax.devices())
    x = np.random.RandomState(0).randn(n * 2, 4, 4, 3).astype(np.float32)
    variables = m.init(jax.random.key(0), jnp.zeros((1, 4, 4, 3)))

    def step(v, x):
        _, updated = m.apply(v, x, train=True, mutable=['batch_stats'])
        return updated['batch_stats']

    # single device, full batch
    ref = jax.jit(step)(variables, jnp.asarray(x))
    # sharded over the mesh
    mesh = create_mesh()
    xs = shard_batch({'x': x}, mesh)['x']
    vs = replicate(variables, mesh)
    got = jax.jit(step)(vs, xs)
    ref_leaves = jax.tree.leaves(ref)
    got_leaves = jax.tree.leaves(got)
    for r, g in zip(ref_leaves, got_leaves):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-5)


def test_runner_tensorboard_hook(tmp_path, monkeypatch):
    """TensorboardLoggerHook analogue: scalars written under work_dir
    (ref _base_/default_runtime.py ships the hook commented out)."""
    pytest.importorskip('torch.utils.tensorboard')
    import os
    from segdistill_tpu.engine import checkpoint as ckpt_mod
    from segdistill_tpu.engine.runner import IterBasedRunner
    from segdistill_tpu.parallel import create_mesh
    monkeypatch.setattr(ckpt_mod, 'save_checkpoint',
                        lambda *a, **k: None)

    class _FakeState:
        step = 0

    logs = {'loss': jnp.float32(1.0), 'decode.acc_seg': jnp.float32(50.0)}

    class _Step:
        def __call__(self, state, tv, img, gt):
            state.step += 1
            return state, dict(logs)

    class _Loader:
        def __iter__(self):
            import numpy as np
            while True:
                yield {'img': np.zeros((8, 8, 8, 3), np.float32),
                       'gt_semantic_seg': np.zeros((8, 8, 8), np.int32)}

    runner = IterBasedRunner(
        model=None, train_step=_Step(), state=_FakeState(),
        teacher_vars={}, mesh=create_mesh(), max_iters=2,
        work_dir=str(tmp_path), log_interval=1, tensorboard=True)
    runner.run(_Loader())
    tb_dir = os.path.join(str(tmp_path), 'tf_logs')
    files = os.listdir(tb_dir)
    assert any('tfevents' in f for f in files)


def test_multi_train_step_matches_sequential():
    """k-step scan program (build_multi_train_step) vs k sequential
    single-step dispatches from the same initial state: the steps-per-loop
    decoupling must be semantically free. Every schedule/RNG in the step
    is a pure function of state.step, so the scan body at carry step s
    computes exactly what the s-th dispatch computes."""
    from segdistill_tpu.engine import build_multi_train_step
    from segdistill_tpu.parallel import shard_stacked_batch

    model = build_segmentor(_sd_cfg())
    variables = model.init_variables(jax.random.key(0), (1, 32, 32, 3))
    lr_sched = build_lr_schedule(dict(policy='poly', power=1.0), 6e-5, 100)
    tx = build_optimizer(
        dict(type='AdamW', lr=6e-5, betas=(0.9, 0.999), weight_decay=0.01),
        variables['student']['params'], lr_sched)
    state0 = create_train_state(jax.random.key(1), variables['student'], tx)

    mesh = create_mesh()
    state0 = replicate(state0, mesh)
    teacher_vars = replicate(variables['teacher'], mesh)

    k, B = 3, max(2, len(jax.devices()))
    rng = np.random.RandomState(0)
    imgs = rng.randn(k, B, 32, 32, 3).astype(np.float32)
    gts = rng.randint(0, 19, (k, B, 32, 32)).astype(np.int32)

    single = build_train_step(model, tx, lr_sched, donate=False)
    st = state0
    for s in range(k):
        db = shard_batch({'img': imgs[s], 'gt': gts[s]}, mesh)
        st, log_seq = single(st, teacher_vars, db['img'], db['gt'])

    multi = build_multi_train_step(model, tx, lr_sched, donate=False)
    db = shard_stacked_batch({'img': imgs, 'gt': gts}, mesh)
    st_m, log_m = multi(state0, teacher_vars, db['img'], db['gt'])

    assert int(st_m.step) == int(st.step) == k
    # last inner step's log scalars match the k-th sequential dispatch
    np.testing.assert_allclose(float(log_m['loss']),
                               float(log_seq['loss']), rtol=1e-5)
    # scan-bodied and straight-line programs fuse differently, so
    # last-ulp rounding differs; tolerance = rounding noise, far below
    # one AdamW update quantum (~lr=6e-5)
    for a, b in zip(jax.tree.leaves(st.params), jax.tree.leaves(st_m.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(st.model_state),
                    jax.tree.leaves(st_m.model_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-6)
