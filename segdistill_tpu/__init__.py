"""SegDistill-TPU: a TPU-native knowledge-distillation framework for semantic segmentation.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of wzpscott/SegDistill
(mmsegmentation v0.11 + Channel Group Distillation). The compute path is
jit-compiled Flax; distillation feature extraction uses functional taps instead
of forward hooks; multi-chip training maps data parallelism onto a
``jax.sharding.Mesh`` with GSPMD collectives over ICI.
"""

from .version import __version__, version_info
from .config import Config, DictAction
from .registry import Registry, build_from_cfg

__all__ = ['__version__', 'version_info', 'Config', 'DictAction', 'Registry',
           'build_from_cfg']
