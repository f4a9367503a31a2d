def add_prefix(inputs, prefix):
    """Namespace a loss dict: {'loss_seg': x} -> {'decode.loss_seg': x}
    (ref contract: mmseg/core/utils/misc.py:1-17)."""
    return {f'{prefix}.{name}': value for name, value in inputs.items()}
