import jax.nn.initializers as init


def to_2tuple(x):
    if isinstance(x, (tuple, list)):
        return tuple(x)
    return (x, x)


def make_divisible(value, divisor, min_value=None, min_ratio=0.9):
    """Round ``value`` to the nearest multiple of ``divisor``
    (ref contract: mmseg/models/utils/make_divisible.py)."""
    if min_value is None:
        min_value = divisor
    new_value = max(min_value, int(value + divisor / 2) // divisor * divisor)
    if new_value < min_ratio * value:
        new_value += divisor
    return new_value


def trunc_normal_init(stddev=0.02):
    """timm-style trunc_normal_(std=.02) initializer (truncated at 2 sigma)."""
    return init.truncated_normal(stddev=stddev)
