from .logger import get_root_logger
from .collect_env import collect_env
from . import image

__all__ = ['get_root_logger', 'collect_env', 'image']
