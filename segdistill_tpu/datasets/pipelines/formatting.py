"""Formatting transforms
(ref contract: mmseg/datasets/pipelines/formating.py:177-288).

TPU-first departure: no DataContainer/CHW — images stay HWC numpy (NHWC is
the TPU layout) and the dataloader stacks them; metas travel as plain dicts.
The ``Collect`` meta_keys contract is preserved verbatim.
"""

import numpy as np

from ..builder import PIPELINES


def to_tensor(data):
    """Coerce to a numpy array (device transfer happens at the batch level)."""
    if isinstance(data, np.ndarray):
        return data
    if isinstance(data, (list, tuple)):
        return np.asarray(data)
    if isinstance(data, (int, float)):
        return np.asarray(data)
    raise TypeError(f'type {type(data)} cannot be converted to tensor')


@PIPELINES.register_module()
class ToTensor:

    def __init__(self, keys):
        self.keys = keys

    def __call__(self, results):
        for key in self.keys:
            results[key] = to_tensor(results[key])
        return results


@PIPELINES.register_module()
class ImageToTensor:
    """Keeps HWC (the reference transposes to CHW for torch)."""

    def __init__(self, keys):
        self.keys = keys

    def __call__(self, results):
        for key in self.keys:
            img = results[key]
            if img.ndim < 3:
                img = np.expand_dims(img, -1)
            results[key] = to_tensor(img)
        return results


@PIPELINES.register_module()
class Transpose:

    def __init__(self, keys, order):
        self.keys = keys
        self.order = order

    def __call__(self, results):
        for key in self.keys:
            results[key] = results[key].transpose(self.order)
        return results


@PIPELINES.register_module()
class DefaultFormatBundle:
    """img -> float32 HWC array; gt_semantic_seg -> int32 (H, W)
    (ref formating.py:177-215, minus the CHW/DataContainer wrapping)."""

    def __call__(self, results):
        if 'img' in results:
            img = results['img']
            if img.ndim < 3:
                img = np.expand_dims(img, -1)
            results['img'] = np.ascontiguousarray(img, dtype=np.float32)
        if 'gt_semantic_seg' in results:
            results['gt_semantic_seg'] = np.ascontiguousarray(
                results['gt_semantic_seg'], dtype=np.int32)
        return results

    def __repr__(self):
        return self.__class__.__name__


@PIPELINES.register_module()
class Collect:
    """Keep data keys + assemble 'img_metas' dict
    (ref formating.py:218-288)."""

    DEFAULT_META_KEYS = ('filename', 'ori_filename', 'ori_shape',
                         'img_shape', 'pad_shape', 'scale_factor', 'flip',
                         'flip_direction', 'img_norm_cfg')

    def __init__(self, keys, meta_keys=DEFAULT_META_KEYS):
        self.keys = keys
        self.meta_keys = meta_keys

    def __call__(self, results):
        data = {}
        img_meta = {key: results[key] for key in self.meta_keys
                    if key in results}
        data['img_metas'] = img_meta
        for key in self.keys:
            data[key] = results[key]
        return data

    def __repr__(self):
        return (f'{self.__class__.__name__}(keys={self.keys}, '
                f'meta_keys={self.meta_keys})')
