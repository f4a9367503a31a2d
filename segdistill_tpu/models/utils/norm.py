"""Norm layer dispatch.

``SyncBN`` in the reference is a native NCCL op (mmcv/torch); on TPU a plain
``flax.linen.BatchNorm`` under ``jit`` over a sharded global batch already
computes *global* batch statistics — GSPMD lowers the mean/variance reductions
to ICI collectives. So SyncBN == BN here by construction.
"""

import flax.linen as nn
import jax.numpy as jnp


class NormLayer(nn.Module):
    """Config-dispatched normalization layer.

    Call with ``train=True`` during training (updates running stats for BN
    variants). Submodule names mirror the torch layout ('bn', 'gn', 'ln') so
    checkpoint converters and name-based optimizer rules line up.
    """
    norm_cfg: dict = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        cfg = dict(self.norm_cfg or dict(type='BN'))
        norm_type = cfg.pop('type')
        cfg.pop('requires_grad', None)
        # statistics run in >= fp32 (bf16 activations promote to f32; f64
        # under jax_enable_x64 stays f64 so the x64 parity gates see no
        # f32 island) but the output returns to the activation dtype —
        # otherwise every BN silently promotes a bf16 network to fp32
        dtype = jnp.promote_types(self.dtype, x.dtype)
        if norm_type in ('BN', 'SyncBN', 'BN2d', 'BN1d'):
            out = nn.BatchNorm(
                use_running_average=not train,
                momentum=1.0 - cfg.pop('momentum', 0.1),
                epsilon=cfg.pop('eps', 1e-5),
                dtype=dtype, name='bn')(x)
        elif norm_type == 'GN':
            out = nn.GroupNorm(
                num_groups=cfg.pop('num_groups'),
                epsilon=cfg.pop('eps', 1e-5),
                dtype=dtype, name='gn')(x)
        elif norm_type == 'LN':
            out = nn.LayerNorm(
                epsilon=cfg.pop('eps', 1e-5),
                dtype=dtype, name='ln')(x)
        else:
            raise KeyError(f'unsupported norm type {norm_type}')
        return out.astype(x.dtype)


def build_norm_layer(norm_cfg, dtype=jnp.float32, name=None):
    return NormLayer(norm_cfg=norm_cfg, dtype=dtype, name=name)


class FusedLayerNorm(nn.Module):
    """Drop-in for ``nn.LayerNorm`` that dispatches to the single-pass
    Pallas kernel on TPU for lane-starved widths (C <= 128 — MiT stages
    1-2 run C in {32..128}; see ops/pallas/layer_norm.py). Param names
    ('scale', 'bias') match nn.LayerNorm so checkpoints, converters and
    the paramwise optimizer rules are unaffected.

    Fallback path = fp32 statistics, output in the activation dtype —
    the same numerics contract as ``nn.LayerNorm(dtype=...)``."""
    epsilon: float = 1e-6
    dtype: jnp.dtype = None

    @nn.compact
    def __call__(self, x):
        import jax

        c = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (c,),
                           jnp.float32)
        bias = self.param('bias', nn.initializers.zeros, (c,), jnp.float32)
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        from ...ops.pallas.layer_norm import (fused_layer_norm,
                                              use_fused_layer_norm)
        if use_fused_layer_norm(x.shape, c):
            return fused_layer_norm(x, scale, bias, float(self.epsilon))
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(dtype)
