"""Distillation engine: config parsing + loss dispatch.

Replaces the reference's mutable hook machinery
(``mmseg/models/distillation/opts.py:13-112``) with a functional design:
models sow feature taps under the reference's layer names; the engine filters
the flattened taps down to the configured layers *inside the jitted step*
(XLA dead-code-eliminates every unused tap) and dispatches the losses.

The config surface is preserved verbatim: a ``distillation`` list of dicts
with ``student_layer`` / ``teacher_layer`` / ``loss_name`` / ``loss_config``;
loss dict keys are the reference's
``loss_{student}<->{teacher}_{info}`` (opts.py:105-110).
``eval(loss_name)`` (opts.py:83) becomes a registry lookup.
"""

import jax.numpy as jnp

from .losses import DISTILL_LOSSES

# tap basenames already stored in reference layout (token/attention tensors)
_TOKEN_TAPS = ('Q', 'K', 'V', 'ATTN')


def convert_tap(name, value):
    """NHWC conv-feature taps -> NCHW (the reference losses' layout).
    Attention taps (B, heads, N, d) and token taps (B, N, C) already match
    the reference layout."""
    base = name.rsplit('.', 1)[-1]
    if value.ndim == 4 and base not in _TOKEN_TAPS:
        return jnp.transpose(value, (0, 3, 1, 2))
    return value


def _layer_list(entry_layer):
    return list(entry_layer) if isinstance(entry_layer, list) \
        else [entry_layer]


def needed_layers(distillation):
    """(student layer names, teacher layer names) the config consumes
    (ref opts.py:36-46)."""
    student_layers, teacher_layers = [], []
    for entry in distillation:
        student_layers += _layer_list(entry['student_layer'])
        teacher_layers += _layer_list(entry['teacher_layer'])
    return student_layers, teacher_layers


class DistillationLoss:
    """Builds criteria from the config and computes the distill loss dict
    (ref contract: opts.py:74-112)."""

    def __init__(self, distillation):
        self.entries = []
        for entry in distillation:
            loss_name = entry['loss_name']
            loss_config = entry['loss_config']
            if isinstance(loss_config, tuple):
                loss_config = loss_config[0]
            if loss_name not in DISTILL_LOSSES:
                raise KeyError(
                    f'unknown distillation loss {loss_name}; '
                    f'registered: {sorted(DISTILL_LOSSES)}')
            if isinstance(entry['student_layer'], list):
                # paired-layer form (attention losses): every reference
                # criterion using it is commented out (ref losses.py:239-927,
                # opts.py:91-98) — reject at config-build time, not runtime
                raise NotImplementedError(
                    'paired-layer criteria are dead code in the reference '
                    '(losses.py:239-927); no registered loss uses them')
            criterion = DISTILL_LOSSES[loss_name](**dict(loss_config))
            self.entries.append(dict(entry, criterion=criterion))

    def __call__(self, student_features, teacher_features, gt_semantic_seg,
                 step, rng=None, adapters=None):
        losses = {}
        for i, entry in enumerate(self.entries):
            s_layer, t_layer = entry['student_layer'], entry['teacher_layer']
            criterion = entry['criterion']
            x_s = _lookup(student_features, s_layer, 'student')
            x_t = _lookup(teacher_features, t_layer, 'teacher')
            x_s = convert_tap(s_layer, x_s)
            if adapters and f'adapter_{i}' in adapters:
                # trainable 1x1 channel adapter for cross-width
                # student/teacher pairs (ref 'channel_nums' contract,
                # opts.py:25-27 + Conv1d :115-125). Conv feature taps are
                # NCHW (channel axis 1); token taps (B, N, C) keep
                # channels last — the ref Conv1d's ``dim`` argument.
                p = adapters[f'adapter_{i}']
                k = p['kernel'].astype(x_s.dtype)
                b = p['bias'].astype(x_s.dtype)
                if x_s.ndim == 4:
                    x_s = jnp.einsum('bchw,cd->bdhw', x_s, k) \
                        + b[None, :, None, None]
                else:
                    x_s = x_s @ k + b
            loss = criterion(x_s, convert_tap(t_layer, x_t),
                             gt_semantic_seg, step, rng=rng)
            loss_cfg = entry.get('loss_config') or {}
            # SDModuleMT's aligned path overrides the info suffix with the
            # entry index (ref opts.py:203-208: f'..._{i}')
            loss_info = entry.get('loss_info')
            if loss_info is None:
                loss_info = loss_cfg.get('transform_config', 'other') \
                    if isinstance(loss_cfg, dict) else 'other'
            losses[f'loss_{s_layer}<->{t_layer}_{loss_info}'] = loss
        return losses


def _lookup(features, layer, role):
    if layer not in features:
        raise KeyError(
            f'{role} layer {layer!r} has no feature tap; available taps: '
            f'{sorted(features)}')
    return features[layer]
