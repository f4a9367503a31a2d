"""Worker for the 2-process multi-host smoke test (run via subprocess;
see test_multihost.py). Covers the code paths the reference exercises with
torch.distributed (apis/test.py:104-235 + DDP): jax.distributed.initialize,
make_array_from_process_local_data feeding, GSPMD-reduced train steps, and
the histogram process_allgather used by fast_evaluate."""

import json
import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=4').strip()

import jax

jax.config.update('jax_platforms', 'cpu')


def main():
    coordinator, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(
        sys.argv[3])
    if num_procs > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_procs, process_id=pid)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import numpy as np
    import jax.numpy as jnp
    from segdistill_tpu.engine import (build_optimizer, build_train_step,
                                       create_train_state)
    from segdistill_tpu.models import build_segmentor
    from segdistill_tpu.parallel import create_mesh, replicate, shard_batch

    assert jax.process_count() == num_procs
    assert jax.device_count() == 4 * num_procs

    def enc(depth):
        # ResNet18+FCN: small CPU compile; SyncBN exercises the GSPMD
        # cross-host batch-stat reduction
        return dict(type='EncoderDecoder',
                    backbone=dict(type='ResNet', depth=depth, num_stages=4,
                                  out_indices=(0, 1, 2, 3),
                                  norm_cfg=dict(type='SyncBN',
                                                requires_grad=True)),
                    decode_head=dict(
                        type='FCNHead', in_channels=512, in_index=3,
                        channels=32, num_convs=1, concat_input=False,
                        dropout_ratio=0.0, num_classes=7,
                        norm_cfg=dict(type='SyncBN', requires_grad=True),
                        align_corners=False))

    model = build_segmentor(dict(
        type='SDModule',
        cfg_s=enc(18),
        cfg_t=enc(18),
        distillation=[{
            'student_layer': 'decode_head.conv_seg',
            'teacher_layer': 'decode_head.conv_seg',
            'loss_name': 'CGDLoss',
            'loss_config': {'group_size': 2, 'alpha': 1, 'tau': 2},
        }]))
    variables = model.init_variables(jax.random.key(0), (1, 32, 32, 3))

    tx = build_optimizer(dict(type='SGD', lr=0.05, momentum=0.0),
                         variables['student']['params'])
    state = create_train_state(jax.random.key(1), variables['student'], tx)
    mesh = create_mesh()
    state = replicate(state, mesh)
    teacher_vars = replicate(variables['teacher'], mesh)
    step_fn = build_train_step(model, tx, donate=False)

    GLOBAL_BATCH = 8
    per_host = GLOBAL_BATCH // num_procs
    rs = np.random.RandomState(7)
    losses = []
    for it in range(3):
        # every process derives the SAME global batch, then slices its
        # host share (contiguous block layout of
        # make_array_from_process_local_data over a 1-D mesh)
        img_g = rs.randn(GLOBAL_BATCH, 32, 32, 3).astype(np.float32)
        gt_g = rs.randint(0, 7, (GLOBAL_BATCH, 32, 32)).astype(np.int32)
        sl = slice(pid * per_host, (pid + 1) * per_host)
        batch = shard_batch({'img': img_g[sl], 'gt': gt_g[sl]}, mesh)
        state, log_vars = step_fn(state, teacher_vars, batch['img'],
                                  batch['gt'])
        losses.append(float(jax.device_get(log_vars['loss'])))

    # histogram allgather (fast_evaluate's reduction, apis/test.py)
    from jax.experimental import multihost_utils
    local_hist = np.arange(8, dtype=np.float32) + 100 * pid
    if num_procs > 1:
        summed = multihost_utils.process_allgather(local_hist).sum(axis=0)
    else:
        summed = local_hist
    print(json.dumps({'pid': pid, 'losses': losses,
                      'hist': summed.tolist()}))


if __name__ == '__main__':
    main()
