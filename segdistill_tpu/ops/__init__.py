from .resize import resize, resize_nchw
from .softmax import softmax_lastdim
from .wrappers import Upsample

__all__ = ['resize', 'resize_nchw', 'softmax_lastdim', 'Upsample']
