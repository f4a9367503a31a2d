"""Process-aware root logger (ref contract: mmseg/utils/logger.py:6-33).

Rank-awareness maps to ``jax.process_index()``: only process 0 logs at the
requested level, others at ERROR."""

import logging

_initialized = {}


def get_root_logger(log_file=None, log_level=logging.INFO,
                    name='segdistill_tpu'):
    logger = logging.getLogger(name)
    if name in _initialized:
        return logger

    fmt = logging.Formatter(
        '%(asctime)s - %(name)s - %(levelname)s - %(message)s')
    stream = logging.StreamHandler()
    stream.setFormatter(fmt)
    logger.addHandler(stream)

    try:
        import jax
        rank = jax.process_index()
    except Exception:
        rank = 0

    if rank == 0 and log_file is not None:
        fh = logging.FileHandler(log_file, 'w')
        fh.setFormatter(fmt)
        logger.addHandler(fh)

    logger.setLevel(log_level if rank == 0 else logging.ERROR)
    logger.propagate = False
    _initialized[name] = True
    return logger
