"""Stochastic depth (DropPath), the JAX way: explicit PRNG threading.

Reference uses timm's DropPath (``mix_transformer.py:11``); determinism on TPU
comes from the 'dropout' rng stream rather than global torch seeds.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp


class DropPath(nn.Module):
    drop_prob: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic=True):
        if self.drop_prob == 0.0 or deterministic:
            return x
        keep_prob = 1.0 - self.drop_prob
        rng = self.make_rng('dropout')
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep_prob, shape=shape)
        return jnp.where(mask, x / keep_prob, jnp.zeros_like(x))
