"""Module-style wrappers over functional ops (ref: mmseg/ops/wrappers.py:32-53)."""

import flax.linen as nn

from .resize import resize


class Upsample(nn.Module):
    """Flax counterpart of the reference ``Upsample`` module."""
    size: tuple = None
    scale_factor: float = None
    mode: str = 'nearest'
    align_corners: bool = False

    @nn.compact
    def __call__(self, x):
        return resize(x, size=self.size, scale_factor=self.scale_factor,
                      mode=self.mode, align_corners=self.align_corners)
