"""General self-attention block
(ref contract: mmseg/models/utils/self_attention_block.py, 159 LoC).

query/key/value projections + scaled dot-product over flattened spatial
positions — the building block of NL/GC/DNL/OCR heads. NHWC; the attention
einsums run on the MXU with fp32 softmax.
"""

import flax.linen as nn
import jax.numpy as jnp

from .conv_module import ConvModule


class SelfAttentionBlock(nn.Module):
    key_in_channels: int = None
    query_in_channels: int = None
    channels: int = None
    out_channels: int = None
    share_key_query: bool = False
    query_downsample: int = 1
    key_downsample: int = 1
    key_query_num_convs: int = 1
    value_out_num_convs: int = 1
    key_query_norm: bool = False
    value_out_norm: bool = False
    matmul_norm: bool = True
    with_out: bool = True
    conv_cfg: dict = None
    norm_cfg: dict = None
    act_cfg: dict = None

    def _project(self, x, channels, num_convs, use_norm, name, train):
        for i in range(num_convs):
            norm = self.norm_cfg if use_norm else None
            act = self.act_cfg if use_norm else None
            x = ConvModule(out_channels=channels, kernel_size=1,
                           norm_cfg=norm, act_cfg=act,
                           name=f'{name}_{i}')(x, train=train)
        return x

    @nn.compact
    def __call__(self, query_feats, key_feats, train=False):
        q = self._project(query_feats, self.channels,
                          self.key_query_num_convs, self.key_query_norm,
                          'query_project', train)
        if self.share_key_query:
            k = q
        else:
            k = self._project(key_feats, self.channels,
                              self.key_query_num_convs,
                              self.key_query_norm, 'key_project', train)
        v = self._project(key_feats,
                          self.out_channels if not self.with_out
                          else self.channels,
                          self.value_out_num_convs, self.value_out_norm,
                          'value_project', train)

        b, hq, wq, c = q.shape
        hk, wk = k.shape[1], k.shape[2]
        qf = q.reshape(b, hq * wq, c).astype(jnp.float32)
        kf = k.reshape(b, hk * wk, c).astype(jnp.float32)
        vf = v.reshape(b, hk * wk, v.shape[-1]).astype(jnp.float32)

        sim = jnp.einsum('bqc,bkc->bqk', qf, kf)
        if self.matmul_norm:
            sim = sim * (self.channels ** -0.5)
        sim = nn.softmax(sim, axis=-1)
        ctx = jnp.einsum('bqk,bkc->bqc', sim, vf).astype(query_feats.dtype)
        ctx = ctx.reshape(b, hq, wq, -1)
        if self.with_out:
            # ref self_attention_block.py:76-83: out_project uses
            # value_out_num_convs too
            ctx = self._project(ctx, self.out_channels,
                                self.value_out_num_convs,
                                self.value_out_norm, 'out_project', train)
        return ctx
