"""Loss reduction helpers (ref contract: mmseg/models/losses/utils.py).

Key semantic preserved exactly: with ``reduction='mean'`` and no
``avg_factor``, the mean runs over *all* elements — ignored pixels contribute
zeros to the numerator but still count in the denominator. This is the loss
scale every reference recipe was tuned with (SURVEY §7 hard part (b)).
"""

import functools

import jax.numpy as jnp


def reduce_loss(loss, reduction):
    if reduction == 'none':
        return loss
    if reduction == 'mean':
        return jnp.mean(loss)
    if reduction == 'sum':
        return jnp.sum(loss)
    raise ValueError(f'invalid reduction: {reduction}')


def weight_reduce_loss(loss, weight=None, reduction='mean', avg_factor=None):
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        return reduce_loss(loss, reduction)
    if reduction == 'mean':
        return jnp.sum(loss) / avg_factor
    if reduction != 'none':
        raise ValueError('avg_factor can only be used with reduction="mean"')
    return loss


def weighted_loss(loss_func):
    """Decorator turning an elementwise loss into a weighted/reduced one."""

    @functools.wraps(loss_func)
    def wrapper(pred, target, weight=None, reduction='mean', avg_factor=None,
                **kwargs):
        loss = loss_func(pred, target, **kwargs)
        return weight_reduce_loss(loss, weight, reduction, avg_factor)

    return wrapper
