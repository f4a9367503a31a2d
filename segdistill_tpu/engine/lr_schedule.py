"""LR schedules (ref contract: mmcv LrUpdaterHook as configured by
``lr_config`` dicts, e.g. local_configs/exp_tab5/segformer_CGD.py:66-70).

mmcv warmup semantics preserved: during warmup,
``lr = base * (1 - (1 - iter/warmup_iters) * (1 - warmup_ratio))`` (linear),
then the main policy takes over.
"""

import jax.numpy as jnp


def build_lr_schedule(lr_config, base_lr, max_iters):
    cfg = dict(lr_config or {})
    policy = cfg.pop('policy', 'fixed')
    warmup = cfg.pop('warmup', None)
    warmup_iters = cfg.pop('warmup_iters', 0)
    warmup_ratio = cfg.pop('warmup_ratio', 0.1)
    cfg.pop('by_epoch', None)

    if policy == 'poly':
        power = cfg.pop('power', 1.0)
        min_lr = cfg.pop('min_lr', 0.0)

        def main(step):
            coeff = jnp.power(1.0 - step / max_iters, power)
            return (base_lr - min_lr) * coeff + min_lr
    elif policy == 'step':
        steps = cfg.pop('step')
        gamma = cfg.pop('gamma', 0.1)
        if isinstance(steps, int):
            steps = [steps]

        def main(step):
            exp = sum(jnp.where(step >= s, 1, 0) for s in steps)
            return base_lr * gamma ** exp
    elif policy == 'fixed':
        def main(step):
            return jnp.asarray(base_lr)
    else:
        raise NotImplementedError(f'lr policy {policy}')

    if warmup is None:
        return main

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        frac = jnp.clip(step / max(warmup_iters, 1), 0.0, 1.0)
        if warmup == 'linear':
            warm = base_lr * (1.0 - (1.0 - frac) * (1.0 - warmup_ratio))
        elif warmup == 'exp':
            warm = base_lr * warmup_ratio ** (1.0 - frac)
        elif warmup == 'constant':
            warm = base_lr * warmup_ratio
        else:
            raise NotImplementedError(f'warmup {warmup}')
        return jnp.where(step < warmup_iters, warm, main(step))

    return schedule
