"""Torch oracle for MixVisionTransformer
(ref: mmseg/models/backbones/mix_transformer.py:20-442).

Key layouts match the reference exactly (block{s}.{i}.attn.{q,kv,sr,norm,
proj}, mlp.{fc1,dwconv.dwconv,fc2}, patch_embed{s}.{proj,norm}, norm{s})
so state dicts round-trip through the production converter. eps detail
preserved: Block/stage norms use eps=1e-6 (the ``norm_layer`` partial,
ref :397), while OverlapPatchEmbed.norm and Attention.norm are plain
``nn.LayerNorm`` -> torch default eps 1e-5 (ref :89,194).
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class DWConv(nn.Module):
    """ref mix_transformer.py:376-387."""

    def __init__(self, dim):
        super().__init__()
        self.dwconv = nn.Conv2d(dim, dim, 3, 1, 1, bias=True, groups=dim)

    def forward(self, x, H, W):
        B, N, C = x.shape
        x = self.dwconv(x.transpose(1, 2).view(B, C, H, W))
        return x.flatten(2).transpose(1, 2)


class Mlp(nn.Module):
    """ref mix_transformer.py:20-55 (drop omitted: parity runs use drop=0)."""

    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.dwconv = DWConv(hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x, H, W):
        return self.fc2(F.gelu(self.dwconv(self.fc1(x), H, W)))


class Attention(nn.Module):
    """Spatial-reduction attention (ref mix_transformer.py:63-133)."""

    def __init__(self, dim, num_heads, sr_ratio, qkv_bias=True):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.q = nn.Linear(dim, dim, bias=qkv_bias)
        self.kv = nn.Linear(dim, dim * 2, bias=qkv_bias)
        self.proj = nn.Linear(dim, dim)
        self.sr_ratio = sr_ratio
        if sr_ratio > 1:
            self.sr = nn.Conv2d(dim, dim, sr_ratio, sr_ratio)
            self.norm = nn.LayerNorm(dim)  # torch default eps 1e-5

    def forward(self, x, H, W):
        B, N, C = x.shape
        nh = self.num_heads
        q = self.q(x).reshape(B, N, nh, C // nh).permute(0, 2, 1, 3)
        if self.sr_ratio > 1:
            x_ = x.permute(0, 2, 1).reshape(B, C, H, W)
            x_ = self.sr(x_).reshape(B, C, -1).permute(0, 2, 1)
            x_ = self.norm(x_)
        else:
            x_ = x
        kv = self.kv(x_).reshape(B, -1, 2, nh, C // nh).permute(2, 0, 3, 1, 4)
        k, v = kv[0], kv[1]
        attn = ((q @ k.transpose(-2, -1)) * self.scale).softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class Block(nn.Module):
    """ref mix_transformer.py:136-176 (drop_path omitted: parity uses 0)."""

    def __init__(self, dim, num_heads, sr_ratio, mlp_ratio=4):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = Attention(dim, num_heads, sr_ratio)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))

    def forward(self, x, H, W):
        x = x + self.attn(self.norm1(x), H, W)
        x = x + self.mlp(self.norm2(x), H, W)
        return x


class OverlapPatchEmbed(nn.Module):
    """ref mix_transformer.py:179-219."""

    def __init__(self, patch_size, stride, in_chans, embed_dim):
        super().__init__()
        self.proj = nn.Conv2d(in_chans, embed_dim, patch_size, stride,
                              patch_size // 2)
        self.norm = nn.LayerNorm(embed_dim)  # torch default eps 1e-5

    def forward(self, x):
        x = self.proj(x)
        _, _, H, W = x.shape
        return self.norm(x.flatten(2).transpose(1, 2)), H, W


class MixVisionTransformer(nn.Module):
    """ref mix_transformer.py:222-374 (forward_features)."""

    def __init__(self, embed_dims, num_heads, depths, sr_ratios):
        super().__init__()
        patch = [(7, 4, 3), (3, 2, embed_dims[0]), (3, 2, embed_dims[1]),
                 (3, 2, embed_dims[2])]
        for s in range(4):
            ps, st, ic = patch[s]
            setattr(self, f'patch_embed{s + 1}',
                    OverlapPatchEmbed(ps, st, ic, embed_dims[s]))
            setattr(self, f'block{s + 1}', nn.ModuleList([
                Block(embed_dims[s], num_heads[s], sr_ratios[s])
                for _ in range(depths[s])]))
            setattr(self, f'norm{s + 1}', nn.LayerNorm(embed_dims[s],
                                                       eps=1e-6))

    def forward(self, x):
        B = x.shape[0]
        outs = []
        for s in range(4):
            x, H, W = getattr(self, f'patch_embed{s + 1}')(x)
            for blk in getattr(self, f'block{s + 1}'):
                x = blk(x, H, W)
            x = getattr(self, f'norm{s + 1}')(x)
            x = x.reshape(B, H, W, -1).permute(0, 3, 1, 2).contiguous()
            outs.append(x)
        return outs


def mit_b0():
    """ref mix_transformer.py:391-397."""
    return MixVisionTransformer([32, 64, 160, 256], [1, 2, 5, 8],
                                [2, 2, 2, 2], [8, 4, 2, 1])
