"""Environment report (ref contract: mmseg/utils/collect_env.py)."""

import platform
import sys


def collect_env():
    import jax
    import flax
    import numpy as np
    from ..version import __version__

    env = {
        'sys.platform': sys.platform,
        'Python': sys.version.replace('\n', ''),
        'CPU': platform.processor() or platform.machine(),
        'JAX': jax.__version__,
        'Flax': flax.__version__,
        'NumPy': np.__version__,
        'Devices': ', '.join(str(d) for d in jax.devices()),
        'Process count': jax.process_count(),
        'SegDistillTPU': __version__,
    }
    return env
