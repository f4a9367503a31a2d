"""Orbax checkpointing (ref contract: mmcv CheckpointHook + resume,
apis/train.py:129-136 and mmcv_custom/checkpoint.py).

State saved: step, student params, optimizer state, BN stats, PRNG key.
Loss schedules need no special resume handling — they are pure functions of
the step (the reference needs ``model.cnt = runner.iter``, apis/train.py:136).

Meta: the reference stamps every checkpoint with the mmseg version, the full
config text, and the dataset CLASSES/PALETTE (ref tools/train.py:145-153),
and reads CLASSES/PALETTE back at test time (ref tools/test.py:131-135).
Here the meta rides as ``meta.json`` next to the orbax step dirs (orbax owns
the step-dir contents; a sidecar keeps restores oblivious to it).

Path flexibility: the reference's ``--resume-from`` names a checkpoint
*file*; orbax checkpoints are directories. Every loader here accepts a
training work dir (containing ``checkpoints/``), the ``checkpoints/`` dir
itself, or a single orbax step dir (``.../checkpoints/<step>``).
"""

import json
import os
import os.path as osp

import jax
import numpy as np
import orbax.checkpoint as ocp

from .train_state import TrainState

META_NAME = 'meta.json'


def _resolve(path):
    """-> (checkpoints_dir, step_or_None) for a work dir, a checkpoints
    dir, or a single orbax step dir."""
    path = osp.abspath(path)
    sub = osp.join(path, 'checkpoints')
    if osp.isdir(sub):
        return sub, None
    base = osp.basename(path.rstrip(os.sep))
    if base.isdigit() and osp.isdir(path):
        return osp.dirname(path), int(base)
    return path, None


def _manager(ckpt_dir, max_keep=1):
    os.makedirs(ckpt_dir, exist_ok=True)
    options = ocp.CheckpointManagerOptions(max_to_keep=max_keep,
                                           create=True)
    return ocp.CheckpointManager(ckpt_dir, options=options)


def save_checkpoint(work_dir, state, max_keep=1, meta=None):
    ckpt_dir = osp.abspath(osp.join(work_dir, 'checkpoints'))
    mgr = _manager(ckpt_dir, max_keep)
    step = int(state.step)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()
    if meta is not None:
        meta = dict(meta, iter=step)
        with open(osp.join(ckpt_dir, META_NAME), 'w') as f:
            json.dump(meta, f)
    return step


def load_meta(path):
    """Checkpoint meta dict (CLASSES/PALETTE/config/version, ref
    tools/test.py:131-135) or None. Accepts work dir / checkpoints dir /
    step dir."""
    ckpt_dir, _ = _resolve(path)
    meta_path = osp.join(ckpt_dir, META_NAME)
    if not osp.isfile(meta_path):
        return None
    with open(meta_path) as f:
        return json.load(f)


def load_checkpoint(path, state, step=None):
    """Restore into the (abstract or concrete) ``state`` template.
    ``path``: work dir, checkpoints dir, or a single orbax step dir."""
    ckpt_dir, path_step = _resolve(path)
    mgr = _manager(ckpt_dir)
    if step is None:
        step = path_step if path_step is not None else mgr.latest_step()
    if step is None:
        mgr.close()
        raise FileNotFoundError(f'no checkpoint found under {path!r}')
    restored = mgr.restore(step, args=ocp.args.StandardRestore(state))
    mgr.close()
    return restored


def load_weights(path, state):
    """Weights-only warm start (ref ``load_from`` semantics,
    apis/train.py:134-135: ``runner.load_checkpoint`` loads the state dict
    but the iteration counter stays 0 and the optimizer starts fresh).

    ``path``: an orbax dir (work dir / checkpoints dir / step dir). Returns
    ``state`` with params + model_state replaced, step/opt_state/rng kept.
    """
    restored = load_checkpoint(path, state)
    return state.replace(params=restored.params,
                         model_state=restored.model_state)


def resume_latest(work_dir, state, strict=False):
    """Resume if a checkpoint exists, else return state unchanged.

    ``strict=False`` is the reference's forgiving auto-resume
    (apis/train.py:129-133 bare except). An explicit ``--resume-from``
    must pass ``strict=True``: a corrupted or missing checkpoint then
    raises instead of silently restarting a 160k-iter run at iter 0.
    """
    try:
        return load_checkpoint(work_dir, state), True
    except FileNotFoundError:
        if strict:
            raise
        return state, False
    except Exception as e:
        if strict:
            raise RuntimeError(
                f'failed to resume from {work_dir!r}: {e}') from e
        import logging
        logging.getLogger('segdistill').warning(
            'auto-resume from %r failed (%s: %s); starting from scratch',
            work_dir, type(e).__name__, e)
        return state, False
