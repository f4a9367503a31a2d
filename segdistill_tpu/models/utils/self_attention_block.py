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
    # ANN: pyramid-pool key/value AFTER their projections (ref
    # self_attention_block.py:141-146 applies key_downsample to the
    # projected key and value; pooling does not commute with the
    # projection ReLU)
    key_pool_scales: tuple = None
    conv_cfg: dict = None
    norm_cfg: dict = None
    act_cfg: dict = None

    def _project(self, x, channels, num_convs, use_norm, name, train,
                 zero_init=False):
        for i in range(num_convs):
            norm = self.norm_cfg if use_norm else None
            act = self.act_cfg if use_norm else None
            x = ConvModule(out_channels=channels, kernel_size=1,
                           norm_cfg=norm, act_cfg=act,
                           zero_init=zero_init,
                           name=f'{name}_{i}')(x, train=train)
        return x

    @nn.compact
    def __call__(self, query_feats, key_feats, train=False):
        if self.share_key_query:
            # the shared projection lives under 'key_project' (ref
            # self_attention_block.py:48-57: query_project aliases it, so
            # the state dict stores only key_project)
            chain = [ConvModule(out_channels=self.channels, kernel_size=1,
                                norm_cfg=self.norm_cfg
                                if self.key_query_norm else None,
                                act_cfg=self.act_cfg
                                if self.key_query_norm else None,
                                name=f'key_project_{i}')
                     for i in range(self.key_query_num_convs)]

            def apply_chain(x):
                for m in chain:
                    x = m(x, train=train)
                return x

            q = apply_chain(query_feats)
            k = apply_chain(key_feats)
        else:
            q = self._project(query_feats, self.channels,
                              self.key_query_num_convs,
                              self.key_query_norm, 'query_project', train)
            k = self._project(key_feats, self.channels,
                              self.key_query_num_convs,
                              self.key_query_norm, 'key_project', train)
        v = self._project(key_feats,
                          self.out_channels if not self.with_out
                          else self.channels,
                          self.value_out_num_convs, self.value_out_norm,
                          'value_project', train)
        if self.key_pool_scales is not None:
            from ..decode_heads.psp_head import adaptive_avg_pool

            def ppm_concat(x):
                return jnp.concatenate(
                    [adaptive_avg_pool(x, s).astype(x.dtype).reshape(
                        x.shape[0], -1, 1, x.shape[-1])
                     for s in self.key_pool_scales], axis=1)

            k = ppm_concat(k)
            v = ppm_concat(v)

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
            # value_out_num_convs too; bare (un-normed) out projections
            # are ZERO-initialized (ref :94-97 constant_init(m, 0)) so
            # the attention residual starts as identity
            ctx = self._project(ctx, self.out_channels,
                                self.value_out_num_convs,
                                self.value_out_norm, 'out_project', train,
                                zero_init=not self.value_out_norm)
        return ctx
