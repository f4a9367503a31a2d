"""Segmentor base plumbing (ref contract: mmseg/models/segmentors/base.py).

Key re-designs vs the torch reference:

* ``_parse_losses`` (ref base.py:174-209) becomes the pure function
  :func:`parse_losses` living inside the jitted step; the distributed
  all-reduce of log scalars is a ``jax.lax.pmean``/GSPMD mean instead of an
  explicit NCCL call — under pjit the log scalars are already global.
* torch forward hooks become sown 'feats' collections; :func:`flatten_feats`
  flattens the nested tree into the reference's dotted layer names
  ('decode_head.linear_pred', 'backbone.block4.1.FEA', ...) so reference
  distillation configs work verbatim.
"""

import re

import jax.numpy as jnp
import numpy as np


def parse_losses(losses):
    """(loss dict) -> (total loss, log_vars). Tensor entries are averaged
    (the reference's ``.mean()``), lists summed; every key containing 'loss'
    adds into the total (ref base.py:174-199)."""
    log_vars = {}
    for name, value in losses.items():
        if isinstance(value, (list, tuple)):
            log_vars[name] = sum(jnp.mean(v) for v in value)
        else:
            log_vars[name] = jnp.mean(value)
    total = sum(v for k, v in log_vars.items() if 'loss' in k)
    log_vars['loss'] = total
    return total, log_vars


# path-component renames mapping flax auto-names of module lists back to the
# reference's dotted layer names (each backbone documents its own rules)
_TAP_RENAMES = [
    (re.compile(r'^block(\d+)_(\d+)$'), r'block\1.\2'),
    (re.compile(r'^layer(\d+)_(\d+)$'), r'layer\1.\2'),
    (re.compile(r'^layers_(\d+)_blocks_(\d+)$'), r'layers.\1.blocks.\2'),
    (re.compile(r'^layers_(\d+)_downsample$'), r'layers.\1.downsample'),
    (re.compile(r'^convs_(\d+)$'), r'convs.\1'),
    (re.compile(r'^auxiliary_head_(\d+)$'), r'auxiliary_head.\1'),
]


def _rename_component(comp):
    for pat, repl in _TAP_RENAMES:
        m = pat.match(comp)
        if m:
            return pat.sub(repl, comp)
    return comp


def flatten_feats(tree, prefix=()):
    """Flatten a sown 'feats' collection into {dotted reference name: array}.

    The terminal sow name 'OUT' denotes "this module's output" and is
    dropped, so a residual block's tap is addressable by the module path
    itself (e.g. 'backbone.layer4.2'), exactly like a torch forward hook.
    """
    flat = {}
    for key, value in tree.items():
        if isinstance(value, dict):
            flat.update(flatten_feats(value, prefix + (key,)))
        else:
            if isinstance(value, (tuple, list)) and len(value) >= 1:
                value = value[-1]  # sow stores a tuple of sown values
            comps = [_rename_component(c) for c in prefix]
            if key.endswith('__tap'):
                key = key[:-len('__tap')]
            if key != 'OUT':
                comps.append(_rename_component(key))
            flat['.'.join(comps)] = value
    return flat


class BaseSegmentor:
    """Common surface for segmentor wrappers (plain python, owns a flax net).

    Subclasses expose: ``net`` (flax module), ``init_variables(rng, shape)``,
    ``loss_step`` pieces, and inference helpers. All compute methods are pure
    in (variables, inputs) and safe to jit.
    """

    num_classes = None
    align_corners = False

    @property
    def with_neck(self):
        return getattr(self, 'neck_cfg', None) is not None

    @property
    def with_auxiliary_head(self):
        return bool(getattr(self, 'auxiliary_head_cfg', None))

    def show_result(self, img, result, palette=None, classes=None,
                    opacity=0.5):
        """Overlay a seg map on an image (ref base.py:211-273). Host-side
        numpy utility."""
        seg = np.asarray(result)
        if palette is None:
            rng = np.random.RandomState(42)
            n = int(seg.max()) + 1 if self.num_classes is None \
                else self.num_classes
            palette = rng.randint(0, 255, size=(n, 3))
        palette = np.asarray(palette, dtype=np.uint8)
        color_seg = palette[seg]
        img = np.asarray(img).astype(np.float32)
        out = img * (1 - opacity) + color_seg[..., ::-1] * opacity
        return out.astype(np.uint8)
