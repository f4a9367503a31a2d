"""Orbax checkpointing (ref contract: mmcv CheckpointHook + resume,
apis/train.py:129-136 and mmcv_custom/checkpoint.py).

State saved: step, student params, optimizer state, BN stats, PRNG key.
Loss schedules need no special resume handling — they are pure functions of
the step (the reference needs ``model.cnt = runner.iter``, apis/train.py:136).
"""

import os
import os.path as osp

import jax
import numpy as np
import orbax.checkpoint as ocp

from .train_state import TrainState


def _manager(work_dir, max_keep=1):
    path = osp.abspath(osp.join(work_dir, 'checkpoints'))
    os.makedirs(path, exist_ok=True)
    options = ocp.CheckpointManagerOptions(max_to_keep=max_keep,
                                           create=True)
    return ocp.CheckpointManager(path, options=options)


def save_checkpoint(work_dir, state, max_keep=1):
    mgr = _manager(work_dir, max_keep)
    step = int(state.step)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()
    return step


def load_checkpoint(work_dir, state, step=None):
    """Restore into the (abstract or concrete) ``state`` template."""
    mgr = _manager(work_dir)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f'no checkpoint found in {work_dir}')
    restored = mgr.restore(step, args=ocp.args.StandardRestore(state))
    mgr.close()
    return restored


def resume_latest(work_dir, state):
    """Resume if a checkpoint exists, else return state unchanged
    (the reference's forgiving resume, apis/train.py:129-133)."""
    try:
        return load_checkpoint(work_dir, state), True
    except Exception:  # match the reference's bare-except leniency
        return state, False
