"""MixVisionTransformer (Segformer encoder), TPU-native.

Functionally equivalent to the reference backbone
(``mmseg/models/backbones/mix_transformer.py:221-442``) with two deliberate
departures:

* layout is NHWC end to end; tokens are ``(B, N, C)`` with N ordered
  row-major over (H, W), matching the reference's ``flatten(2)`` order, so
  distillation feature maps correspond element-for-element;
* the reference's ``Hook`` identity modules (``mix_transformer.py:57-61``)
  — inserted purely so torch forward hooks can grab attention internals —
  become functional taps via ``self.sow('feats', ...)``. Taps that no
  configured distillation loss consumes are filtered out inside the jitted
  step and eliminated by XLA DCE, so they are free.

Tap names reproduce the reference layer names:
``backbone.block{s}.{i}.attn.{Q,K,V,ATTN}`` and ``backbone.block{s}.{i}.FEA``.
"""

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.dwconv import DepthwiseConv2d
from ...ops.softmax import softmax_lastdim
from ..builder import BACKBONES
from ..utils import DropPath, trunc_normal_init

# attention softmax + distill losses stay fp32 islands under bf16 compute
_F32 = jnp.float32


class DWConv(nn.Module):
    """3x3 depthwise conv mixing inside the MLP (ref: mix_transformer.py:376-387).

    ``backend`` picks the forward form (params identical either way —
    see ops/dwconv.py):
    * fp32 always takes the tap sum (XLA's fp32 grouped-conv lowering is
      pathological on TPU: 2.6x whole-step, docs/perf.md round 3);
    * 'auto' additionally taps deterministic bf16 (standalone inference:
      +9% fps measured);
    * 'conv'/'tap' force the bf16 choice — SDModule builds its teachers
      with 'conv' because inside the train step the conv forward overlaps
      better with the student's backward (measured 201 vs 191 imgs/s).
    """
    dim: int
    backend: str = 'auto'

    @nn.compact
    def __call__(self, x, H, W, deterministic=True):
        B, N, C = x.shape
        x = x.reshape(B, H, W, C)
        use_tap = (x.dtype == jnp.float32 or self.backend == 'tap'
                   or (self.backend == 'auto' and deterministic))
        x = DepthwiseConv2d(self.dim, (3, 3), (1, 1), (1, 1),
                            use_bias=True, dtype=x.dtype,
                            use_tap=use_tap, name='dwconv')(x)
        return x.reshape(B, H * W, C)


class MatmulStatLN(nn.Module):
    """Drop-in for ``nn.LayerNorm`` computing the (sum, sum-of-squares)
    statistics via two tiny MXU matmuls instead of minor-dim VPU reduces.

    At MiT stage-1 token counts the lane dim carries only C=32/64 of 128
    lanes, and XLA's minor-dim reduction is the slowest op class in the
    stage (docs/perf.md "lane-starved LN reductions"). A (rows, C) @
    (C, 2) dot computes both sums on the MXU at full rate — measured
    standalone 1.94 -> 0.89 ms fwd+bwd at (131072, 32) bf16. Unlike the
    Pallas FusedLayerNorm (a measured fusion-barrier regression), this
    stays inside XLA so surrounding fusions survive. Param layout and
    fast-variance semantics match ``nn.LayerNorm``; opt-in via the
    backbone's ``ln_stats='matmul'`` knob, and only applied where the
    standalone ladder wins (C <= 64, >= 64k rows) — elsewhere the module
    falls back to the native path.
    """
    epsilon: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        import os
        C = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (C,))
        bias = self.param('bias', nn.initializers.zeros, (C,))
        rows = int(np.prod(x.shape[:-1]))
        # 64k-row floor = the measured win boundary (ladder knob for
        # experiments; 32768-row stage-2 measured at parity-or-lose)
        min_rows = int(os.environ.get('SEGDISTILL_LN_MIN_ROWS', '65536'))
        if C > 64 or rows < min_rows:
            # native reduce path (identical to nn.LayerNorm)
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            mean2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
        else:
            ones = jnp.ones((C, 2), jnp.float32)
            xf = x.astype(jnp.float32)
            dims = (((x.ndim - 1,), (0,)), ((), ()))
            mean = jax.lax.dot_general(
                xf, ones, dims, preferred_element_type=jnp.float32
            )[..., :1] / C
            mean2 = jax.lax.dot_general(
                xf * xf, ones, dims, preferred_element_type=jnp.float32
            )[..., :1] / C
        var = jnp.maximum(mean2 - mean * mean, 0.0)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)


def _ln(stats, **kw):
    return MatmulStatLN(**kw) if stats == 'matmul' else nn.LayerNorm(**kw)


class Mlp(nn.Module):
    hidden_features: int
    out_features: int
    drop: float = 0.0
    gelu_approximate: bool = True
    dwconv_backend: str = 'auto'

    @nn.compact
    def __call__(self, x, H, W, deterministic=True):
        x = nn.Dense(self.hidden_features, dtype=x.dtype,
                     kernel_init=trunc_normal_init(), name='fc1')(x)
        x = DWConv(self.hidden_features, backend=self.dwconv_backend,
                   name='dwconv')(x, H, W, deterministic=deterministic)
        # tanh-GELU: erf lowers to a slow transcendental chain on the TPU
        # VPU and measured 3.6x slower whole-model (B3 fwd 135ms -> 37ms);
        # |tanh-erf| GELU delta <= 3e-3, below bf16 rounding. Set
        # gelu_approximate=False on the backbone for bit-level parity runs.
        x = nn.gelu(x, approximate=self.gelu_approximate)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(self.out_features, dtype=x.dtype,
                     kernel_init=trunc_normal_init(), name='fc2')(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class Attention(nn.Module):
    """Spatial-reduction attention (ref: mix_transformer.py:63-133).

    ``sr_ratio`` > 1 convolutionally downsamples K/V — the reference's answer
    to long spatial sequences (SURVEY §5).
    """
    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    qk_scale: float = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    sr_ratio: int = 1
    # False | True (forward-only Pallas kernel, frozen teachers) |
    # 'train' (differentiable Pallas kernel with custom VJP, students)
    fused_attention: Any = False

    @nn.compact
    def __call__(self, x, H, W, deterministic=True):
        B, N, C = x.shape
        nh = self.num_heads
        hd = C // nh
        scale = self.qk_scale or hd ** -0.5

        q = nn.Dense(C, use_bias=self.qkv_bias, dtype=x.dtype,
                     kernel_init=trunc_normal_init(), name='q')(x)
        q = q.reshape(B, N, nh, hd).transpose(0, 2, 1, 3)
        self.sow('feats', 'Q', q)

        if self.sr_ratio > 1:
            if H < self.sr_ratio or W < self.sr_ratio:
                # the reference's nn.Conv2d(k=sr, s=sr) also cannot produce
                # an output here (ref mix_transformer.py:88) — fail with
                # the actual constraint instead of an empty-axis reduce
                raise ValueError(
                    f'SRA stage needs a token grid of at least '
                    f'{self.sr_ratio}x{self.sr_ratio}, got {H}x{W}: '
                    f'input images must be >= 4*sr_ratio '
                    f'({4 * self.sr_ratio}px) per side')
            x_ = x.reshape(B, H, W, C)
            x_ = nn.Conv(C, (self.sr_ratio, self.sr_ratio),
                         strides=self.sr_ratio, padding='VALID',
                         dtype=x.dtype, name='sr')(x_)
            x_ = x_.reshape(B, -1, C)
            # ref mix_transformer.py:89 — plain nn.LayerNorm(dim), i.e. the
            # torch default eps 1e-5 (the 1e-6 norm_layer partial only
            # reaches Block/stage norms)
            x_ = nn.LayerNorm(epsilon=1e-5, dtype=x.dtype, name='norm')(x_)
        else:
            x_ = x
        kv = nn.Dense(2 * C, use_bias=self.qkv_bias, dtype=x.dtype,
                      kernel_init=trunc_normal_init(), name='kv')(x_)
        kv = kv.reshape(B, -1, 2, nh, hd).transpose(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        self.sow('feats', 'K', k)
        self.sow('feats', 'V', v)

        from ...ops.pallas import (can_use_fused_attn, fused_sra_attention,
                                   sra_attention_train)
        if (self.fused_attention and self.attn_drop == 0.0
                and can_use_fused_attn(q.shape, k.shape[2], hd)):
            # fused q@k^T -> fp32 softmax -> @v; never materializes the
            # (N, M) attention tensor. 'train' uses the custom-VJP kernel
            # (scores never touch HBM in either pass); True is the
            # forward-only kernel for frozen teachers under stop_gradient.
            # The 'ATTN' tap is unavailable on either fused path (the
            # SDModule gates these defaults off when a distillation entry
            # hooks attention maps).
            if self.fused_attention == 'train':
                out = sra_attention_train(q, k, v, scale)
            else:
                out = fused_sra_attention(q, k, v, scale)
        else:
            attn = jnp.einsum('bhnd,bhmd->bhnm', q, k,
                              preferred_element_type=jnp.float32) * scale
            self.sow('feats', 'ATTN', attn)
            # native-dtype scores/probs, fp32-in-register softmax: under
            # bf16 the (B, h, N, M) tensors all stay bf16 in HBM (the
            # stage-1 score plane is the largest activation in the step);
            # fp32 path is bit-identical to nn.softmax (ops/softmax.py)
            attn = softmax_lastdim(attn.astype(x.dtype))
            attn = nn.Dropout(self.attn_drop)(attn,
                                              deterministic=deterministic)
            out = jnp.einsum('bhnm,bhmd->bhnd', attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        out = nn.Dense(C, dtype=x.dtype, kernel_init=trunc_normal_init(),
                       name='proj')(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    qk_scale: float = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    sr_ratio: int = 1
    gelu_approximate: bool = True
    fused_attention: Any = False  # False | True | 'train' (see Attention)
    dwconv_backend: str = 'auto'
    ln_stats: str = 'native'  # 'matmul' -> MatmulStatLN where it wins

    @nn.compact
    def __call__(self, x, H, W, deterministic=True):
        h = _ln(self.ln_stats, epsilon=1e-6, dtype=x.dtype,
                name='norm1')(x)
        h = Attention(self.dim, num_heads=self.num_heads,
                      qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                      attn_drop=self.attn_drop, proj_drop=self.drop,
                      sr_ratio=self.sr_ratio,
                      fused_attention=self.fused_attention, name='attn')(
                          h, H, W, deterministic=deterministic)
        x = x + DropPath(self.drop_path, name='drop_path1')(
            h, deterministic=deterministic)
        h = _ln(self.ln_stats, epsilon=1e-6, dtype=x.dtype,
                name='norm2')(x)
        h = Mlp(int(self.dim * self.mlp_ratio), self.dim, drop=self.drop,
                gelu_approximate=self.gelu_approximate,
                dwconv_backend=self.dwconv_backend,
                name='mlp')(h, H, W, deterministic=deterministic)
        x = x + DropPath(self.drop_path, name='drop_path2')(
            h, deterministic=deterministic)
        self.sow('feats', 'FEA', x)
        return x


class OverlapPatchEmbed(nn.Module):
    patch_size: int = 7
    stride: int = 4
    embed_dim: int = 768

    @nn.compact
    def __call__(self, x):
        p = self.patch_size // 2
        x = nn.Conv(self.embed_dim, (self.patch_size, self.patch_size),
                    strides=self.stride, padding=[(p, p), (p, p)],
                    dtype=x.dtype, name='proj')(x)
        B, H, W, C = x.shape
        x = x.reshape(B, H * W, C)
        # ref mix_transformer.py:194 — torch-default eps 1e-5 (see Attention)
        x = nn.LayerNorm(epsilon=1e-5, dtype=x.dtype, name='norm')(x)
        return x, H, W


@BACKBONES.register_module()
class MixVisionTransformer(nn.Module):
    embed_dims: Sequence[int] = (64, 128, 256, 512)
    num_heads: Sequence[int] = (1, 2, 4, 8)
    mlp_ratios: Sequence[float] = (4, 4, 4, 4)
    qkv_bias: bool = False
    qk_scale: float = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    depths: Sequence[int] = (3, 4, 6, 3)
    sr_ratios: Sequence[int] = (8, 4, 2, 1)
    gelu_approximate: bool = True
    # Pallas SRA attention: False | True (forward-only, teachers) |
    # 'train' (custom-VJP kernel, students) | a per-stage 4-sequence of
    # those (the kernels win at some stage shapes and lose at others —
    # docs/perf.md "flash SRA" notes)
    fused_attention: Any = False
    with_cp: bool = False  # gradient checkpointing per block (jax.remat)
    dwconv_backend: str = 'auto'  # Mix-FFN depthwise form (see DWConv)
    ln_stats: str = 'native'  # 'matmul' -> MXU-stat LN at eligible shapes
    dtype: jnp.dtype = jnp.float32

    # feature-tap path components needing list-index renames
    TAP_RENAMES = [(r'^block(\d+)_(\d+)$', r'block\1.\2')]

    @nn.compact
    def __call__(self, x, train=False):
        x = x.astype(self.dtype)
        det = not train
        # stochastic depth decay rule (ref: mix_transformer.py:241)
        total = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1)
               for i in range(total)]

        # remat trades recompute for activation memory on long stages
        # (ref contract: the torch with_cp/checkpointing flag)
        block_cls = nn.remat(Block, static_argnums=(2, 3, 4)) \
            if self.with_cp else Block

        fa = self.fused_attention
        fa_stages = tuple(fa) if isinstance(fa, (list, tuple)) else (fa,) * 4

        outs = []
        cur = 0
        patch_cfg = [(7, 4), (3, 2), (3, 2), (3, 2)]
        for s in range(4):
            ps, st = patch_cfg[s]
            x, H, W = OverlapPatchEmbed(
                patch_size=ps, stride=st, embed_dim=self.embed_dims[s],
                name=f'patch_embed{s + 1}')(x)
            for i in range(self.depths[s]):
                x = block_cls(dim=self.embed_dims[s],
                          num_heads=self.num_heads[s],
                          mlp_ratio=self.mlp_ratios[s],
                          qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
                          drop=self.drop_rate,
                          attn_drop=self.attn_drop_rate,
                          drop_path=dpr[cur + i],
                          sr_ratio=self.sr_ratios[s],
                          gelu_approximate=self.gelu_approximate,
                          fused_attention=fa_stages[s],
                          dwconv_backend=self.dwconv_backend,
                          ln_stats=self.ln_stats,
                          name=f'block{s + 1}_{i}')(x, H, W, det)
            x = _ln(self.ln_stats, epsilon=1e-6, dtype=x.dtype,
                    name=f'norm{s + 1}')(x)
            x = x.reshape(x.shape[0], H, W, -1)
            outs.append(x)
            cur += self.depths[s]
        return tuple(outs)


def _mit(embed_dims, depths, **kwargs):
    kwargs.pop('style', None)
    kwargs.pop('pretrained', None)
    kwargs.setdefault('drop_rate', 0.0)
    kwargs.setdefault('drop_path_rate', 0.1)
    if isinstance(kwargs.get('fused_attention'), list):  # config lists
        kwargs['fused_attention'] = tuple(kwargs['fused_attention'])
    return dict(embed_dims=tuple(embed_dims), num_heads=(1, 2, 5, 8),
                mlp_ratios=(4, 4, 4, 4), qkv_bias=True,
                depths=tuple(depths), sr_ratios=(8, 4, 2, 1), **kwargs)


# ref variant table: mix_transformer.py:391-442 (factory functions — flax
# modules are frozen dataclasses, so variants are parameterizations)
@BACKBONES.register_module(name='mit_b0')
def mit_b0(**kwargs):
    return MixVisionTransformer(**_mit([32, 64, 160, 256], [2, 2, 2, 2],
                                       **kwargs))


@BACKBONES.register_module(name='mit_b1')
def mit_b1(**kwargs):
    return MixVisionTransformer(**_mit([64, 128, 320, 512], [2, 2, 2, 2],
                                       **kwargs))


@BACKBONES.register_module(name='mit_b2')
def mit_b2(**kwargs):
    return MixVisionTransformer(**_mit([64, 128, 320, 512], [3, 4, 6, 3],
                                       **kwargs))


@BACKBONES.register_module(name='mit_b3')
def mit_b3(**kwargs):
    return MixVisionTransformer(**_mit([64, 128, 320, 512], [3, 4, 18, 3],
                                       **kwargs))


@BACKBONES.register_module(name='mit_b4')
def mit_b4(**kwargs):
    return MixVisionTransformer(**_mit([64, 128, 320, 512], [3, 8, 27, 3],
                                       **kwargs))


@BACKBONES.register_module(name='mit_b5')
def mit_b5(**kwargs):
    return MixVisionTransformer(**_mit([64, 128, 320, 512], [3, 6, 40, 3],
                                       **kwargs))
