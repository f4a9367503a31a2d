"""Swin Transformer backbone, TPU-native NHWC.

Functional equivalent of the reference
(``mmseg/models/backbones/swin_transformer.py:72-618``): windowed attention
with relative position bias, shifted windows with the attention mask, patch
merging, absolute-position-embedding option. Window partitioning is pure
static reshapes (shapes are known at trace time) so XLA tiles the windowed
matmuls onto the MXU; the shift is ``jnp.roll``.

Checkpoint conversion (incl. bicubic interpolation of the relative position
bias table on window-size mismatch, ref ``mmcv_custom/checkpoint.py:281-350``)
lives in tools/converters.
"""

from typing import Sequence

import numpy as np
import flax.linen as nn
import jax.numpy as jnp

from ...ops.softmax import softmax_lastdim
from ..builder import BACKBONES
from ..utils import DropPath, trunc_normal_init


def window_partition(x, ws):
    """(B, H, W, C) -> (num_windows*B, ws, ws, C)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)


def window_reverse(windows, ws, H, W):
    B = windows.shape[0] // (H * W // ws // ws)
    x = windows.reshape(B, H // ws, W // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


def _relative_position_index(ws):
    """Static (ws*ws, ws*ws) index into the bias table (ref swin:92-104)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing='ij'))  # 2, ws, ws
    coords_flat = coords.reshape(2, -1)
    rel = coords_flat[:, :, None] - coords_flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


class WindowAttention(nn.Module):
    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    qk_scale: float = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0

    @nn.compact
    def __call__(self, x, mask=None, deterministic=True):
        B_, N, C = x.shape
        nh = self.num_heads
        hd = C // nh
        scale = self.qk_scale or hd ** -0.5
        ws = self.window_size

        bias_table = self.param(
            'relative_position_bias_table', trunc_normal_init(),
            ((2 * ws - 1) ** 2, nh), jnp.float32)
        rel_index = jnp.asarray(_relative_position_index(ws))

        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=x.dtype,
                       kernel_init=trunc_normal_init(), name='qkv')(x)
        qkv = qkv.reshape(B_, N, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        attn = jnp.einsum('bhnd,bhmd->bhnm', q, k,
                          preferred_element_type=jnp.float32) * scale
        rel_bias = bias_table[rel_index.reshape(-1)].reshape(
            ws * ws, ws * ws, nh).transpose(2, 0, 1)
        attn = attn + rel_bias[None].astype(attn.dtype)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, nh, N, N) \
                + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(-1, nh, N, N)
        # native-dtype scores/probs, fp32-in-register softmax (bf16 halves
        # the window-attention HBM traffic; fp32 bit-identical) — see
        # ops/softmax.py
        attn = softmax_lastdim(attn.astype(x.dtype))
        attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)

        out = jnp.einsum('bhnm,bhmd->bhnd', attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B_, N, C)
        out = nn.Dense(C, dtype=x.dtype, kernel_init=trunc_normal_init(),
                       name='proj')(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class SwinMlp(nn.Module):
    hidden_features: int
    out_features: int
    drop: float = 0.0
    gelu_approximate: bool = True  # see mix_transformer.Mlp

    @nn.compact
    def __call__(self, x, deterministic=True):
        x = nn.Dense(self.hidden_features, dtype=x.dtype,
                     kernel_init=trunc_normal_init(), name='fc1')(x)
        x = nn.gelu(x, approximate=self.gelu_approximate)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(self.out_features, dtype=x.dtype,
                     kernel_init=trunc_normal_init(), name='fc2')(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


def _attn_mask(Hp, Wp, ws, shift):
    """Static attention mask for shifted windows (ref swin:209-227)."""
    img_mask = np.zeros((1, Hp, Wp, 1), dtype=np.float32)
    cnt = 0
    for h in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[:, h, w, :] = cnt
            cnt += 1
    mask_windows = img_mask.reshape(1, Hp // ws, ws, Wp // ws, ws, 1)
    mask_windows = mask_windows.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    attn_mask = mask_windows[:, None, :] - mask_windows[:, :, None]
    attn_mask = np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)
    return jnp.asarray(attn_mask)


class SwinTransformerBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: float = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    gelu_approximate: bool = True

    @nn.compact
    def __call__(self, x, H, W, deterministic=True):
        B, L, C = x.shape
        # reference semantics (swin:200-249): the window size is FIXED;
        # small maps are zero-padded up to a window multiple and the
        # shifted-window mask handles the rest. (An earlier adaptive
        # window-shrink here diverged from the reference on maps smaller
        # than the window.)
        ws = self.window_size
        shift = self.shift_size

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=x.dtype, name='norm1')(x)
        x = x.reshape(B, H, W, C)

        pad_b = (ws - H % ws) % ws
        pad_r = (ws - W % ws) % ws
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r

        if shift > 0:
            x = jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))
            mask = _attn_mask(Hp, Wp, ws, shift)
        else:
            mask = None

        windows = window_partition(x, ws).reshape(-1, ws * ws, C)
        attn_out = WindowAttention(
            self.dim, ws, self.num_heads, qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale, attn_drop=self.attn_drop,
            proj_drop=self.drop, name='attn')(
                windows, mask=mask, deterministic=deterministic)
        x = window_reverse(attn_out.reshape(-1, ws, ws, C), ws, Hp, Wp)

        if shift > 0:
            x = jnp.roll(x, shift=(shift, shift), axis=(1, 2))
        if pad_b or pad_r:
            x = x[:, :H, :W]
        x = x.reshape(B, H * W, C)

        x = shortcut + DropPath(self.drop_path, name='drop_path1')(
            x, deterministic=deterministic)
        h = nn.LayerNorm(epsilon=1e-5, dtype=x.dtype, name='norm2')(x)
        h = SwinMlp(int(self.dim * self.mlp_ratio), self.dim, drop=self.drop,
                    gelu_approximate=self.gelu_approximate,
                    name='mlp')(h, deterministic=deterministic)
        x = x + DropPath(self.drop_path, name='drop_path2')(
            h, deterministic=deterministic)
        self.sow('feats', 'OUT', x)
        return x


class PatchMerging(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x, H, W):
        B, L, C = x.shape
        x = x.reshape(B, H, W, C)
        if H % 2 or W % 2:
            x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = x.reshape(B, -1, 4 * C)
        x = nn.LayerNorm(epsilon=1e-5, dtype=x.dtype, name='norm')(x)
        x = nn.Dense(2 * self.dim, use_bias=False, dtype=x.dtype,
                     kernel_init=trunc_normal_init(), name='reduction')(x)
        return x


@BACKBONES.register_module()
class SwinTransformer(nn.Module):
    """ref variant (Swin-T student): embed_dim 96, depths (2,2,6,2),
    heads (3,6,12,24), window 7 (``local_configs/exp_tab5/swin_CGD.py``)."""
    pretrain_img_size: int = 224
    patch_size: int = 4
    in_chans: int = 3
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: float = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.2
    gelu_approximate: bool = True
    ape: bool = False
    patch_norm: bool = True
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = -1
    use_checkpoint: bool = False
    pretrained: str = None
    style: str = None
    dtype: jnp.dtype = jnp.float32

    TAP_RENAMES = [
        (r'^layers_(\d+)_blocks_(\d+)$', r'layers.\1.blocks.\2'),
        (r'^layers_(\d+)_downsample$', r'layers.\1.downsample'),
    ]

    @nn.compact
    def __call__(self, x, train=False):
        x = x.astype(self.dtype)
        det = not train
        ps = self.patch_size
        # PatchEmbed (ref swin:397-437): pad to multiple of patch size
        B, H0, W0, _ = x.shape
        pad_b = (ps - H0 % ps) % ps
        pad_r = (ps - W0 % ps) % ps
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        x = nn.Conv(self.embed_dim, (ps, ps), strides=ps, padding='VALID',
                    dtype=x.dtype, name='patch_embed_proj')(x)
        B, H, W, C = x.shape
        x = x.reshape(B, H * W, C)
        if self.patch_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=x.dtype,
                             name='patch_embed_norm')(x)
        if self.ape:
            pe_hw = self.pretrain_img_size // ps
            ape = self.param('absolute_pos_embed', trunc_normal_init(),
                             (1, pe_hw * pe_hw, self.embed_dim), jnp.float32)
            from ...ops import resize
            ape_map = ape.reshape(1, pe_hw, pe_hw, self.embed_dim)
            ape_map = resize(ape_map, size=(H, W), mode='bilinear',
                             align_corners=False)
            x = x + ape_map.reshape(1, H * W, self.embed_dim).astype(x.dtype)
        x = nn.Dropout(self.drop_rate)(x, deterministic=det)

        total = sum(self.depths)
        dpr = [self.drop_path_rate * i / max(total - 1, 1)
               for i in range(total)]

        outs = []
        cur = 0
        dim = self.embed_dim
        num_layers = len(self.depths)
        for li in range(num_layers):
            for bi in range(self.depths[li]):
                x = SwinTransformerBlock(
                    dim=dim, num_heads=self.num_heads[li],
                    window_size=self.window_size,
                    shift_size=0 if bi % 2 == 0 else self.window_size // 2,
                    mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                    qk_scale=self.qk_scale, drop=self.drop_rate,
                    attn_drop=self.attn_drop_rate, drop_path=dpr[cur + bi],
                    gelu_approximate=self.gelu_approximate,
                    name=f'layers_{li}_blocks_{bi}')(x, H, W,
                                                     deterministic=det)
            if li in self.out_indices:
                out = nn.LayerNorm(epsilon=1e-5, dtype=x.dtype,
                                   name=f'norm{li}')(x)
                outs.append(out.reshape(B, H, W, dim))
            if li < num_layers - 1:
                x = PatchMerging(dim=dim,
                                 name=f'layers_{li}_downsample')(x, H, W)
                H, W = (H + 1) // 2, (W + 1) // 2
                dim *= 2
            cur += self.depths[li]
        return tuple(outs)
