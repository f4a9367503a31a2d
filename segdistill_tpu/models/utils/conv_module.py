"""ConvModule: conv + norm + activation bundle (ref contract: mmcv.cnn.ConvModule).

NHWC layout throughout (TPU-native). ``bias='auto'`` disables the conv bias
when a norm layer follows, matching the reference behavior.
"""

import flax.linen as nn
import jax.numpy as jnp

from .activation import build_activation
from .norm import NormLayer
from .misc import to_2tuple


class ConvModule(nn.Module):
    in_channels: int = None  # kept for config parity; flax infers input width
    out_channels: int = None
    kernel_size: int = 1
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    bias: object = 'auto'
    conv_cfg: dict = None
    norm_cfg: dict = None
    # mmcv semantics: unset -> ReLU, explicit None -> NO activation.
    # A flax dataclass field can't default to a dict, so 'default' is the
    # unset sentinel (None must stay distinguishable — every
    # InvertedResidual linear_conv / HRNet fuse tail / ANN fusion passes
    # None meaning identity, ref mmcv.cnn.ConvModule act_cfg contract).
    act_cfg: object = 'default'
    order: tuple = ('conv', 'norm', 'act')
    default_act: dict = None  # class-level default when act_cfg is unset
    zero_init: bool = False  # zero kernel+bias (mmcv constant_init(m, 0))

    def _act_cfg(self):
        if self.act_cfg != 'default':
            return self.act_cfg  # may be None -> identity
        if self.default_act is not None:
            return self.default_act
        return dict(type='ReLU')

    @nn.compact
    def __call__(self, x, train=False):
        with_norm = self.norm_cfg is not None
        use_bias = self.bias if self.bias != 'auto' else not with_norm
        k = to_2tuple(self.kernel_size)
        s = to_2tuple(self.stride)
        p = to_2tuple(self.padding)
        d = to_2tuple(self.dilation)
        act_cfg = self._act_cfg()
        if act_cfg is not None and act_cfg.get('type') == 'PReLU':
            # learnable activation -> child module named 'activate', the
            # torch mmcv ConvModule submodule key (…activate.weight)
            from .activation import PReLU
            act = PReLU(init=act_cfg.get('init', 0.25), name='activate')
        else:
            act = build_activation(act_cfg)

        if self.groups > 1 and self.groups == x.shape[-1] \
                and self.out_channels == self.groups:
            # true depthwise: XLA's grouped-conv lowering is pathological
            # on TPU (see ops/dwconv.py) — use the tap-sum form (param
            # layout identical to nn.Conv)
            from ...ops.dwconv import DepthwiseConv2d
            import jax.numpy as jnp
            use_tap = (not train) or x.dtype == jnp.float32
            conv = DepthwiseConv2d(
                self.out_channels, k, s, p, d,
                use_bias=bool(use_bias), dtype=x.dtype,
                use_tap=use_tap, name='conv')
        else:
            init_kw = dict(kernel_init=nn.initializers.zeros) \
                if self.zero_init else {}
            conv = nn.Conv(
                features=self.out_channels,
                kernel_size=k,
                strides=s,
                padding=[(p[0], p[0]), (p[1], p[1])],
                kernel_dilation=d,
                feature_group_count=self.groups,
                use_bias=bool(use_bias),
                dtype=x.dtype,
                name='conv', **init_kw)
        # child named by norm kind ('bn'/'gn'/'ln'), matching the torch
        # ConvModule layout — keeps mmcv custom_keys substring rules (e.g.
        # 'norm': decay_mult 0) behaving exactly like the reference
        if with_norm:
            kind = self.norm_cfg.get('type', 'BN')
            nname = {'GN': 'gn', 'LN': 'ln'}.get(kind, 'bn')
            norm = NormLayer(norm_cfg=self.norm_cfg, name=nname)
        else:
            norm = None

        for layer in self.order:
            if layer == 'conv':
                x = conv(x)
            elif layer == 'norm' and with_norm:
                x = norm(x, train=train)
            elif layer == 'act':
                x = act(x)
        return x


class DepthwiseSeparableConvModule(nn.Module):
    """Depthwise + pointwise ConvModule pair (ref: mmcv DepthwiseSeparableConvModule)."""
    in_channels: int = None
    out_channels: int = None
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    norm_cfg: dict = None
    act_cfg: object = 'default'
    dw_norm_cfg: object = 'default'
    dw_act_cfg: object = 'default'
    pw_norm_cfg: object = 'default'
    pw_act_cfg: object = 'default'

    @nn.compact
    def __call__(self, x, train=False):
        in_ch = x.shape[-1]
        dw_norm = self.norm_cfg if self.dw_norm_cfg == 'default' else self.dw_norm_cfg
        dw_act = self.act_cfg if self.dw_act_cfg == 'default' else self.dw_act_cfg
        pw_norm = self.norm_cfg if self.pw_norm_cfg == 'default' else self.pw_norm_cfg
        pw_act = self.act_cfg if self.pw_act_cfg == 'default' else self.pw_act_cfg
        x = ConvModule(
            out_channels=in_ch, kernel_size=self.kernel_size,
            stride=self.stride, padding=self.padding, dilation=self.dilation,
            groups=in_ch, norm_cfg=dw_norm, act_cfg=dw_act,
            name='depthwise_conv')(x, train=train)
        x = ConvModule(
            out_channels=self.out_channels, kernel_size=1,
            norm_cfg=pw_norm, act_cfg=pw_act,
            name='pointwise_conv')(x, train=train)
        return x
