"""Optimizer construction with mmcv paramwise semantics
(ref contract: mmcv DefaultOptimizerConstructor as driven by
``optimizer = dict(type='AdamW', ..., paramwise_cfg=dict(custom_keys=...))``,
e.g. local_configs/exp_tab5/segformer_CGD.py:60-64).

custom_keys matching replicated exactly: keys sorted reverse-alphabetically,
first key that is a *substring* of the dotted parameter path wins, yielding
(lr_mult, decay_mult). Implemented as optax.multi_transform over path labels.
"""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax


def _param_paths(params):
    flat = flax.traverse_util.flatten_dict(params)
    return {k: '.'.join(k) for k in flat}


def paramwise_labels(params, custom_keys):
    """{flat param key: (lr_mult, decay_mult)} via substring matching."""
    sorted_keys = sorted(custom_keys.keys(), reverse=True)
    labels = {}
    for key, path in _param_paths(params).items():
        lr_mult, decay_mult = 1.0, 1.0
        for ck in sorted_keys:
            if ck in path:
                lr_mult = custom_keys[ck].get('lr_mult', 1.0)
                decay_mult = custom_keys[ck].get('decay_mult', 1.0)
                break
        labels[key] = (float(lr_mult), float(decay_mult))
    return labels


def build_optimizer(optimizer_cfg, params, lr_schedule=None):
    """-> optax.GradientTransformation.

    ``lr_schedule``: step -> lr; defaults to the constant cfg lr. Weight
    decay is decoupled (AdamW) and scaled by decay_mult; lr by lr_mult.
    """
    cfg = dict(optimizer_cfg)
    opt_type = cfg.pop('type')
    base_lr = cfg.pop('lr')
    paramwise = cfg.pop('paramwise_cfg', None) or {}
    custom_keys = dict(paramwise.get('custom_keys', {}))
    if lr_schedule is None:
        def lr_schedule(step):
            return jnp.asarray(base_lr)

    if opt_type == 'AdamW':
        betas = cfg.pop('betas', (0.9, 0.999))
        eps = cfg.pop('eps', 1e-8)
        weight_decay = cfg.pop('weight_decay', 0.0)
        core = optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps)
    elif opt_type == 'SGD':
        momentum = cfg.pop('momentum', 0.0)
        weight_decay = cfg.pop('weight_decay', 0.0)
        core = optax.trace(decay=momentum, nesterov=cfg.pop(
            'nesterov', False))
    elif opt_type == 'Adam':
        betas = cfg.pop('betas', (0.9, 0.999))
        eps = cfg.pop('eps', 1e-8)
        weight_decay = cfg.pop('weight_decay', 0.0)
        core = optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps)
    else:
        raise NotImplementedError(f'optimizer {opt_type}')

    # HOST scalars (np, not jnp): these close over the optimizer update fns
    # and become jaxpr constants of every train step. Eager jnp scalars
    # live on the device, and MLIR lowering fetches every constant back to
    # host — ~400 device->host round-trips per compile (minutes over a
    # tunneled chip, and a lowering wedge was observed; see docs/perf.md
    # round-4 "lowering stall"). np scalars embed for free.
    labels = paramwise_labels(params, custom_keys)
    lr_mults = flax.traverse_util.unflatten_dict(
        {k: np.float32(v[0]) for k, v in labels.items()})
    decay_mults = flax.traverse_util.unflatten_dict(
        {k: np.float32(v[1]) for k, v in labels.items()})

    def add_decayed(updates, state, params):
        # decoupled weight decay, scaled per-param by decay_mult
        if weight_decay:
            updates = jax.tree.map(
                lambda u, p, dm: u + weight_decay * dm * p,
                updates, params, decay_mults)
        return updates, state

    decay_tx = optax.GradientTransformation(
        lambda params: optax.EmptyState(), add_decayed)

    def scale_by_mult(updates, state, params=None):
        del params
        return jax.tree.map(lambda u, m: u * m, updates, lr_mults), state

    mult_tx = optax.GradientTransformation(
        lambda params: optax.EmptyState(), scale_by_mult)

    return optax.chain(
        core,
        decay_tx,
        mult_tx,
        optax.scale_by_learning_rate(lr_schedule),
    )
