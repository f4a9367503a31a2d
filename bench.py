"""Headline benchmark: CGD distillation training throughput on TPU.

Measures the reference's hot loop (SURVEY §3.1): Segformer-B0 student <-
Segformer-B3 frozen teacher, CGD loss on decode_head.linear_pred, ADE20K
shapes (512x512, 150 classes), full fwd+bwd+AdamW step, bf16 compute with
fp32 loss islands.

Baseline: the reference trains this recipe on 4 GPUs at batch 2/GPU
(exp_tab5/segformer_CGD.py:72, paper-era A100/V100 class). Measured-in-repo
numbers don't exist; we use an estimate of 8.0 imgs/sec per GPU for
B0-student + B3-teacher fwd+bwd at 512^2 (B3 teacher forward dominates;
plain B0 training alone runs ~20-25 imgs/s/GPU on this class of hardware).
``vs_baseline`` is imgs/sec/chip over that estimate; BASELINE.json's target
is >= 2.0.

Prints ONE JSON line.
"""

import json
import time

import numpy as np

REFERENCE_IMGS_PER_SEC_PER_CHIP = 8.0

BATCH = 8           # the reference's global batch (2 x 4 GPUs)
CROP = 512
NUM_CLASSES = 150


def build():
    import jax
    from segdistill_tpu.engine import (build_lr_schedule, build_optimizer,
                                       build_train_step, create_train_state)
    from segdistill_tpu.models import build_segmentor
    from segdistill_tpu.parallel import create_mesh, replicate, shard_batch

    norm_cfg = dict(type='SyncBN', requires_grad=True)

    def enc(bb, in_ch, embed):
        return dict(
            type='EncoderDecoder',
            backbone=dict(type=bb, style='pytorch', dtype='bfloat16'),
            decode_head=dict(
                type='SegFormerHead', in_channels=in_ch,
                in_index=[0, 1, 2, 3], feature_strides=[4, 8, 16, 32],
                channels=128, dropout_ratio=0.1, num_classes=NUM_CLASSES,
                norm_cfg=norm_cfg, align_corners=False,
                decoder_params=dict(embed_dim=embed)))

    model_cfg = dict(
        type='SDModule',
        cfg_s=enc('mit_b0', [32, 64, 160, 256], 256),
        cfg_t=enc('mit_b3', [64, 128, 320, 512], 768),
        distillation=[{
            'student_layer': 'decode_head.linear_pred',
            'teacher_layer': 'decode_head.linear_pred',
            'loss_name': 'CGDLoss',
            'loss_config': {'group_size': 10, 'alpha': 3, 'tau': 2},
        }],
        train_cfg=dict(), test_cfg=dict(mode='whole'))
    model = build_segmentor(model_cfg)
    variables = model.init_variables(jax.random.key(0),
                                     (1, CROP, CROP, 3))

    lr_sched = build_lr_schedule(
        dict(policy='poly', warmup='linear', warmup_iters=1500,
             warmup_ratio=1e-6, power=1.0, min_lr=0.0), 6e-5, 160000)
    tx = build_optimizer(
        dict(type='AdamW', lr=6e-5, betas=(0.9, 0.999), weight_decay=0.01,
             paramwise_cfg=dict(custom_keys={
                 'pos_block': dict(decay_mult=0.),
                 'norm': dict(decay_mult=0.),
                 'head': dict(lr_mult=10.)})),
        variables['student']['params'], lr_sched)
    state = create_train_state(jax.random.key(1), variables['student'], tx)

    mesh = create_mesh()
    state = replicate(state, mesh)
    teacher_vars = replicate(variables['teacher'], mesh)
    step_fn = build_train_step(model, tx, lr_sched, donate=True)

    rng = np.random.RandomState(0)
    batch = {
        'img': rng.randn(BATCH, CROP, CROP, 3).astype(np.float32),
        'gt': rng.randint(0, NUM_CLASSES,
                          (BATCH, CROP, CROP)).astype(np.int32),
    }
    device_batch = shard_batch(batch, mesh)
    return step_fn, state, teacher_vars, device_batch, mesh


def main():
    import jax
    n_chips = len(jax.devices())
    step_fn, state, teacher_vars, batch, mesh = build()

    # compile + warmup
    for _ in range(3):
        state, log_vars = step_fn(state, teacher_vars, batch['img'],
                                  batch['gt'])
    jax.block_until_ready(log_vars['loss'])

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, log_vars = step_fn(state, teacher_vars, batch['img'],
                                  batch['gt'])
    jax.block_until_ready(log_vars['loss'])
    dt = time.perf_counter() - t0

    imgs_per_sec = BATCH * iters / dt
    per_chip = imgs_per_sec / n_chips
    print(json.dumps({
        'metric': 'cgd_distill_train_imgs_per_sec_per_chip',
        'value': round(per_chip, 3),
        'unit': 'imgs/sec/chip (B0<-B3, 512x512, batch 8, bf16)',
        'vs_baseline': round(per_chip / REFERENCE_IMGS_PER_SEC_PER_CHIP, 3),
    }))


if __name__ == '__main__':
    main()
