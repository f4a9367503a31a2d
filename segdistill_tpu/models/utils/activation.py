import flax.linen as nn
import jax
import jax.numpy as jnp


class PReLU(nn.Module):
    """Learnable leaky-ReLU slope, one per channel (torch nn.PReLU).

    Param name 'weight' and shape (C,) mirror the torch layout so the
    checkpoint converter's direct-path candidate picks it up. ``init``
    follows torch's default 0.25; mmseg CGNet's init_weights zeroes it
    (ref cgnet.py:354-355) so CGNet passes init=0.0.
    """
    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        w = self.param('weight', nn.initializers.constant(self.init),
                       (x.shape[-1],), jnp.float32)
        w = w.astype(x.dtype)
        return jnp.where(x >= 0, x, w * x)


def build_activation(act_cfg):
    """Return the activation function for an mmcv-style ``act_cfg`` dict."""
    if act_cfg is None:
        return lambda x: x
    cfg = dict(act_cfg)
    act_type = cfg.pop('type')
    if act_type == 'ReLU':
        return jax.nn.relu
    if act_type == 'ReLU6':
        return lambda x: jnp.clip(x, 0.0, 6.0)
    if act_type == 'GELU':
        # torch nn.GELU default is the exact (erf) formulation
        return lambda x: jax.nn.gelu(x, approximate=False)
    if act_type == 'LeakyReLU':
        slope = cfg.pop('negative_slope', 0.01)
        return lambda x: jax.nn.leaky_relu(x, negative_slope=slope)
    if act_type == 'Sigmoid':
        return jax.nn.sigmoid
    if act_type == 'HSigmoid':
        bias = cfg.pop('bias', 1.0)
        divisor = cfg.pop('divisor', 2.0)
        return lambda x: jnp.clip((x + bias) / divisor, 0.0, 1.0)
    if act_type in ('HSwish', 'Hardswish'):
        return jax.nn.hard_swish
    if act_type == 'Swish':
        return jax.nn.silu
    if act_type == 'Tanh':
        return jnp.tanh
    raise KeyError(f'unsupported activation type {act_type}')
