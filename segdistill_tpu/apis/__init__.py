from .train import train_segmentor, set_random_seed, init_segmentor_state
from .test import single_device_test, multi_device_test, fast_evaluate
from .inference import init_segmentor, inference_segmentor, show_result_pyplot

__all__ = [
    'train_segmentor', 'set_random_seed', 'init_segmentor_state',
    'single_device_test', 'multi_device_test', 'fast_evaluate',
    'init_segmentor', 'inference_segmentor', 'show_result_pyplot'
]
