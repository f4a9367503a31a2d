"""PointHead (PointRend) — adaptive point refinement
(ref contract: mmseg/models/decode_heads/point_head.py:12-349).

TPU-native redesign of the dynamic parts, everything static-shape under
jit:

* ``point_sample`` (mmcv compiled op) becomes an explicit bilinear/nearest
  gather with torch ``grid_sample`` coordinate semantics (align_corners
  False: pix = p*S - 0.5, zero padding outside).
* training point selection (ref get_points_train :258-305) keeps the
  oversample -> top-k-uncertain -> fill-random recipe with a STATIC point
  count (``jax.lax.top_k``), drawing from the 'dropout' PRNG stream.
* test-time subdivision (ref forward_test :204-246) runs a fixed number
  of steps; each step upsamples 2x, picks the static-k most uncertain
  positions and scatters refined point logits back (vmapped ``.at[].set``).

The head is a cascade stage: ``__call__(inputs, prev_output, train)``.
In train mode it returns ``(point_logits, point_coords)`` and
``losses()`` samples the GT at those points (nearest); in eval mode it
returns the fully refined logit map.
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import resize
from ..builder import HEADS
from ..losses import accuracy
from ..utils import ConvModule
from .decode_head import BaseDecodeHead
from .ocr_head import BaseCascadeDecodeHead


def point_sample(feat, points, align_corners=False, mode='bilinear'):
    """Sample NHWC ``feat`` at normalized [0,1]^2 ``points`` (B, P, 2) in
    (x, y) order -> (B, P, C). torch grid_sample semantics incl. zero
    padding outside (ref mmcv ops.point_sample)."""
    B, H, W, C = feat.shape
    x = points[..., 0].astype(jnp.float32)
    y = points[..., 1].astype(jnp.float32)
    if align_corners:
        xf = x * (W - 1)
        yf = y * (H - 1)
    else:
        xf = x * W - 0.5
        yf = y * H - 0.5

    def gather(ix, iy):
        valid = ((ix >= 0) & (ix < W) & (iy >= 0) & (iy < H))
        ix = jnp.clip(ix, 0, W - 1)
        iy = jnp.clip(iy, 0, H - 1)
        flat = feat.reshape(B, H * W, C)
        idx = (iy * W + ix).astype(jnp.int32)
        out = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return out * valid[..., None].astype(out.dtype)

    if mode == 'nearest':
        return gather(jnp.round(xf).astype(jnp.int32),
                      jnp.round(yf).astype(jnp.int32))
    x0 = jnp.floor(xf).astype(jnp.int32)
    y0 = jnp.floor(yf).astype(jnp.int32)
    wx = (xf - x0)[..., None]
    wy = (yf - y0)[..., None]
    return (gather(x0, y0) * (1 - wx) * (1 - wy)
            + gather(x0 + 1, y0) * wx * (1 - wy)
            + gather(x0, y0 + 1) * (1 - wx) * wy
            + gather(x0 + 1, y0 + 1) * wx * wy)


def calculate_uncertainty(point_logits):
    """-(top1 - top2) margin over the class axis (ref :14-31); works on
    (..., K) logits."""
    top2 = jax.lax.top_k(point_logits.astype(jnp.float32), 2)[0]
    return top2[..., 1] - top2[..., 0]


@HEADS.register_module()
class PointHead(BaseCascadeDecodeHead):
    input_transform: str = 'multiple_select'  # ref point_head.py:69
    num_fcs: int = 3
    coarse_pred_each_layer: bool = True
    # ref train_cfg (pointrend configs): sampling recipe
    num_points: int = 2048
    oversample_ratio: int = 3
    importance_sample_ratio: float = 0.75
    # ref test_cfg: subdivision refinement
    subdivision_steps: int = 2
    subdivision_num_points: int = 8196
    scale_factor: int = 2

    def _fine_feats(self, x, points):
        feats = [point_sample(f, points, align_corners=self.align_corners)
                 for f in x]
        return feats[0] if len(feats) == 1 else jnp.concatenate(feats, -1)

    def _build_mlp(self):
        """Construct the shared point MLP once — the test-time subdivision
        loop re-applies the same module instances each step."""
        fcs = [ConvModule(out_channels=self.channels, kernel_size=1,
                          norm_cfg=self.norm_cfg, act_cfg=self.act_cfg,
                          name=f'fcs_{k}') for k in range(self.num_fcs)]
        fc_seg = nn.Conv(self.num_classes, (1,),
                         kernel_init=nn.initializers.normal(0.001),
                         name='fc_seg')
        dropout = nn.Dropout(self.dropout_ratio, name='dropout') \
            if self.dropout_ratio > 0 else None
        return fcs, fc_seg, dropout

    def _point_forward(self, mlp, fine, coarse, train):
        """Shared MLP over points (ref forward :117-121); channel-last."""
        fcs, fc_seg, dropout = mlp
        h = jnp.concatenate([fine, coarse], axis=-1)
        for fc in fcs:
            h = fc(h[:, :, None], train=train)[:, :, 0]
            if self.coarse_pred_each_layer:
                h = jnp.concatenate([h, coarse], axis=-1)
        if dropout is not None:
            h = dropout(h, deterministic=not train)
        return fc_seg(h)

    def get_points_train(self, prev_output, rng):
        """Oversample -> top-k uncertain -> fill random (ref :258-305)."""
        B = prev_output.shape[0]
        n_over = int(self.num_points * self.oversample_ratio)
        n_unc = int(self.importance_sample_ratio * self.num_points)
        n_rand = self.num_points - n_unc
        r1, r2 = jax.random.split(rng)
        coords = jax.random.uniform(r1, (B, n_over, 2))
        logits = point_sample(prev_output, coords,
                              align_corners=self.align_corners)
        unc = calculate_uncertainty(logits)               # (B, n_over)
        idx = jax.lax.top_k(unc, n_unc)[1]                # (B, n_unc)
        picked = jnp.take_along_axis(coords, idx[..., None], axis=1)
        if n_rand > 0:
            picked = jnp.concatenate(
                [picked, jax.random.uniform(r2, (B, n_rand, 2))], axis=1)
        return jax.lax.stop_gradient(picked)

    def get_points_test(self, refined):
        """Static-k most-uncertain grid points (ref :307-349)."""
        B, H, W, _ = refined.shape
        k = min(H * W, self.subdivision_num_points)
        unc = calculate_uncertainty(refined).reshape(B, H * W)
        point_indices = jax.lax.top_k(unc, k)[1]          # (B, k)
        xs = (point_indices % W).astype(jnp.float32)
        ys = (point_indices // W).astype(jnp.float32)
        coords = jnp.stack([1.0 / W / 2 + xs / W, 1.0 / H / 2 + ys / H],
                           axis=-1)
        return point_indices, coords

    @nn.compact
    def __call__(self, inputs, prev_output, train=False):
        x = self._transform_inputs(inputs)
        if not isinstance(x, (list, tuple)):
            x = [x]
        mlp = self._build_mlp()
        if train:
            rng = self.make_rng('dropout')
            points = self.get_points_train(
                jax.lax.stop_gradient(prev_output), rng)
            fine = self._fine_feats(x, points)
            coarse = point_sample(prev_output, points,
                                  align_corners=self.align_corners)
            point_logits = self._point_forward(mlp, fine, coarse, train)
            return point_logits, points

        # test: iterative subdivision refinement (ref :204-246)
        refined = prev_output
        for _ in range(self.subdivision_steps):
            B, H, W, K = refined.shape
            refined = resize(refined,
                             size=(H * self.scale_factor,
                                   W * self.scale_factor),
                             mode='bilinear',
                             align_corners=self.align_corners)
            point_indices, coords = self.get_points_test(refined)
            fine = self._fine_feats(x, coords)
            coarse = point_sample(prev_output, coords,
                                  align_corners=self.align_corners)
            point_logits = self._point_forward(mlp, fine, coarse, train)
            Bh, Hh, Wh, Kh = refined.shape
            flat = refined.reshape(Bh, Hh * Wh, Kh)
            flat = jax.vmap(lambda a, i, v: a.at[i].set(v))(
                flat, point_indices, point_logits.astype(flat.dtype))
            refined = flat.reshape(Bh, Hh, Wh, Kh)
        return refined

    def losses(self, outs, seg_label, seg_weight=None):
        """Point CE at GT sampled nearest at the point coords
        (ref forward_train :165-201 + losses :248-256)."""
        from ..builder import build_loss
        point_logits, points = outs
        gt = point_sample(seg_label[..., None].astype(jnp.float32), points,
                          align_corners=self.align_corners, mode='nearest')
        point_label = gt[..., 0].astype(jnp.int32)        # (B, P)
        loss_fn = build_loss(self._loss_cfg())
        logits4 = point_logits[:, :, None]                # (B, P, 1, K)
        label3 = point_label[:, :, None]                  # (B, P, 1)
        return {
            'loss_point': loss_fn(logits4, label3,
                                  ignore_index=self.ignore_index),
            'acc_point': accuracy(logits4, label3),
        }
