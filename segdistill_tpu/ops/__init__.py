from .resize import resize, resize_nchw
from .wrappers import Upsample

__all__ = ['resize', 'resize_nchw', 'Upsample']
