"""Import the ACTUAL reference source (read-only at /root/reference) with
dependency shims, so parity oracles are anchored to the reference code
itself rather than to hand-written replicas (VERDICT r2, Missing #2).

Loaded verbatim by file path under a stubbed ``mmseg``/``mmcv``/``timm``
namespace:

* ``mmseg/ops/wrappers.py``                     (resize)
* ``mmseg/models/losses/{utils,accuracy,cross_entropy_loss}.py``
* ``mmseg/models/decode_heads/{decode_head,segformer_head}.py``
* ``mmseg/models/backbones/mix_transformer.py``
* ``mmseg/models/distillation/{losses,opts}.py`` (Extractor, KLD/CGD/...)

Only the *external* dependencies are stubbed (timm layer helpers, the mmcv
ConvModule/registry/decorator machinery); every line of model/loss math
executed by the oracles comes from the reference files. Tests-only module —
never imported by the package.
"""

import importlib.util
import os
import sys
import types

REF_ROOT = '/root/reference'

_loaded = {}


def reference_available():
    return os.path.isdir(os.path.join(REF_ROOT, 'mmseg'))


# --------------------------------------------------------------------- stubs
class _Registry:
    def __init__(self, name):
        self.name = name
        self.module_dict = {}

    def register_module(self, *args, **kwargs):
        def deco(cls):
            self.module_dict[cls.__name__] = cls
            return cls
        if args and callable(args[0]):
            return deco(args[0])
        return deco

    def get(self, key):
        return self.module_dict.get(key)


def _stub(name, **attrs):
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        mod.__path__ = []  # mark as package so submodules can be imported
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def _load_ref(name, relpath):
    """Load a reference source file verbatim under a dotted module name
    (so its relative imports resolve against the stubs)."""
    if name in _loaded:
        return _loaded[name]
    path = os.path.join(REF_ROOT, relpath)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    _loaded[name] = mod
    # attach to parent stub so `from pkg import child` works
    parent, _, child = name.rpartition('.')
    if parent in sys.modules:
        setattr(sys.modules[parent], child, mod)
    return mod


def _install_stubs():
    import torch
    import torch.nn as nn

    # ---- timm 0.3.2 layer helpers (timm is not installed) ----
    def drop_path(x, drop_prob=0., training=False):
        if drop_prob == 0. or not training:
            return x
        keep_prob = 1 - drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        rnd = keep_prob + torch.rand(shape, dtype=x.dtype, device=x.device)
        rnd.floor_()
        return x.div(keep_prob) * rnd

    class DropPath(nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return drop_path(x, self.drop_prob, self.training)

    def to_2tuple(x):
        if isinstance(x, (tuple, list)):
            return tuple(x)
        return (x, x)

    def trunc_normal_(tensor, mean=0., std=1., a=-2., b=2.):
        return torch.nn.init.trunc_normal_(tensor, mean, std, a, b)

    _stub('timm')
    _stub('timm.models')
    _stub('timm.models.layers', DropPath=DropPath, to_2tuple=to_2tuple,
          trunc_normal_=trunc_normal_, drop_path=drop_path)
    _stub('timm.models.registry',
          register_model=lambda fn=None, **kw: (fn if fn else (lambda f: f)))
    _stub('timm.models.vision_transformer', _cfg=lambda **kw: dict(kw))

    # ---- mmcv 1.2.2 pieces the reference touches ----
    class ConvModule(nn.Module):
        """Behavior-accurate stand-in for mmcv.cnn.ConvModule as the
        reference configs use it: conv -> norm -> act, bias='auto'
        (False when a norm follows), ReLU activation, BN/SyncBN norm
        (single-process SyncBN == BatchNorm2d). State-dict layout matches
        mmcv ('conv.weight', 'bn.weight', ...)."""

        def __init__(self, in_channels, out_channels, kernel_size,
                     stride=1, padding=0, dilation=1, groups=1, bias='auto',
                     conv_cfg=None, norm_cfg=None,
                     act_cfg=dict(type='ReLU'), inplace=True,
                     order=('conv', 'norm', 'act'), **kwargs):
            super().__init__()
            assert conv_cfg is None
            self.order = order
            self.with_norm = norm_cfg is not None
            self.with_activation = act_cfg is not None
            if bias == 'auto':
                bias = not self.with_norm
            self.conv = nn.Conv2d(in_channels, out_channels, kernel_size,
                                  stride=stride, padding=padding,
                                  dilation=dilation, groups=groups,
                                  bias=bias)
            if self.with_norm:
                assert norm_cfg['type'] in ('BN', 'SyncBN')
                self.bn = nn.BatchNorm2d(out_channels)
            if self.with_activation:
                assert act_cfg['type'] == 'ReLU'
                self.activate = nn.ReLU(inplace=inplace)

        def forward(self, x, activate=True, norm=True):
            for layer in self.order:
                if layer == 'conv':
                    x = self.conv(x)
                elif layer == 'norm' and norm and self.with_norm:
                    x = self.bn(x)
                elif layer == 'act' and activate and self.with_activation:
                    x = self.activate(x)
            return x

    class DepthwiseSeparableConvModule(nn.Module):
        """Imported by segformer_head.py but unused by it."""

        def __init__(self, *args, **kwargs):
            super().__init__()
            raise NotImplementedError

    def normal_init(module, mean=0, std=1, bias=0):
        nn.init.normal_(module.weight, mean, std)
        if hasattr(module, 'bias') and module.bias is not None:
            nn.init.constant_(module.bias, bias)

    def _passthrough_deco(*args, **kwargs):
        if args and callable(args[0]):
            return args[0]
        return lambda fn: fn

    _stub('mmcv')
    _stub('mmcv.cnn', ConvModule=ConvModule,
          DepthwiseSeparableConvModule=DepthwiseSeparableConvModule,
          normal_init=normal_init)
    _stub('mmcv.runner', auto_fp16=_passthrough_deco,
          force_fp32=_passthrough_deco,
          load_checkpoint=lambda *a, **k: (_ for _ in ()).throw(
              RuntimeError('load_checkpoint is not shimmed')))

    # ---- mmseg namespace ----
    BACKBONES = _Registry('backbone')
    HEADS = _Registry('head')
    LOSSES = _Registry('loss')
    SEGMENTORS = _Registry('segmentor')

    def build_loss(cfg):
        cfg = dict(cfg)
        cls = LOSSES.module_dict[cfg.pop('type')]
        return cls(**cfg)

    import logging

    _stub('mmseg')
    _stub('mmseg.models')
    _stub('mmseg.models.builder', BACKBONES=BACKBONES, HEADS=HEADS,
          LOSSES=LOSSES, SEGMENTORS=SEGMENTORS, build_loss=build_loss)
    _stub('mmseg.utils', get_root_logger=lambda *a, **k:
          logging.getLogger('ref_shim'))
    _stub('mmseg.core', build_pixel_sampler=lambda *a, **k: (
        _ for _ in ()).throw(RuntimeError('pixel sampler not shimmed')))
    _stub('mmseg.models.utils')          # `import *` source; nothing used
    _stub('mmseg.models.decode_heads')
    _stub('mmseg.models.backbones')
    _stub('mmseg.models.losses')
    _stub('mmseg.models.distillation')
    _stub('mmseg.ops')

    # `.cuda()` appears in the reference's channel-pad path
    # (distillation/losses.py:56); make it a no-op on a CPU-only box
    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self


def load_reference():
    """Load every reference module the oracles need; returns a namespace.

    Call once per test session (idempotent)."""
    if not reference_available():
        raise RuntimeError(f'reference not found at {REF_ROOT}')
    _install_stubs()

    ops = _load_ref('mmseg.ops.wrappers', 'mmseg/ops/wrappers.py')
    sys.modules['mmseg.ops'].resize = ops.resize
    sys.modules['mmseg.ops'].Upsample = getattr(ops, 'Upsample', None)

    _load_ref('mmseg.models.losses.utils', 'mmseg/models/losses/utils.py')
    acc = _load_ref('mmseg.models.losses.accuracy',
                    'mmseg/models/losses/accuracy.py')
    sys.modules['mmseg.models.losses'].accuracy = acc.accuracy
    ce = _load_ref('mmseg.models.losses.cross_entropy_loss',
                   'mmseg/models/losses/cross_entropy_loss.py')

    dh = _load_ref('mmseg.models.decode_heads.decode_head',
                   'mmseg/models/decode_heads/decode_head.py')
    sh = _load_ref('mmseg.models.decode_heads.segformer_head',
                   'mmseg/models/decode_heads/segformer_head.py')
    mit = _load_ref('mmseg.models.backbones.mix_transformer',
                    'mmseg/models/backbones/mix_transformer.py')
    dl = _load_ref('mmseg.models.distillation.losses',
                   'mmseg/models/distillation/losses.py')
    opts = _load_ref('mmseg.models.distillation.opts',
                     'mmseg/models/distillation/opts.py')

    ns = types.SimpleNamespace(
        resize=ops.resize,
        CrossEntropyLoss=ce.CrossEntropyLoss,
        BaseDecodeHead=dh.BaseDecodeHead,
        SegFormerHead=sh.SegFormerHead,
        mix_transformer=mit,
        distill_losses=dl,
        opts=opts,
    )
    for name in ('mit_b0', 'mit_b1', 'mit_b2', 'mit_b3', 'mit_b4', 'mit_b5',
                 'MixVisionTransformer'):
        setattr(ns, name, getattr(mit, name))
    for name in ('KLDLoss', 'PDLoss', 'CDLoss', 'CGDLoss', 'CGDLossWS',
                 'ATLoss', 'IFVDLoss'):
        setattr(ns, name, getattr(dl, name))
    for name in ('Extractor', 'DistillationLoss', 'ExtractorMT',
                 'DistillationLossMT', 'Conv1d'):
        setattr(ns, name, getattr(opts, name))
    return ns
