"""MultiScaleFlipAug: the scale x flip x direction TTA product
(ref contract: mmseg/datasets/pipelines/test_time_aug.py:9-133)."""

from .compose import Compose
from ..builder import PIPELINES


@PIPELINES.register_module()
class MultiScaleFlipAug:

    def __init__(self, transforms, img_scale=None, img_ratios=None,
                 flip=False, flip_direction='horizontal'):
        self.transforms = Compose(transforms)
        if img_ratios is not None:
            img_ratios = img_ratios if isinstance(img_ratios, list) \
                else [img_ratios]
        if img_scale is None:
            # mode 1: resize by ratios of the original shape
            self.img_scale = None
            self.img_ratios = img_ratios
        elif isinstance(img_scale, tuple) and img_ratios is not None:
            # mode 2: scale x ratios
            assert len(img_scale) == 2
            self.img_scale = [(int(img_scale[0] * r), int(img_scale[1] * r))
                              for r in img_ratios]
            self.img_ratios = None
        else:
            # mode 3: explicit scales
            self.img_scale = img_scale if isinstance(img_scale, list) \
                else [img_scale]
            self.img_ratios = None
        self.flip = flip
        self.flip_direction = flip_direction if isinstance(
            flip_direction, list) else [flip_direction]

    def __call__(self, results):
        aug_data = []
        if self.img_scale is None and self.img_ratios is not None:
            h, w = results['img'].shape[:2]
            img_scale = [(int(w * r), int(h * r)) for r in self.img_ratios]
        else:
            img_scale = self.img_scale
        flip_args = [(False, None)]
        if self.flip:
            flip_args += [(True, d) for d in self.flip_direction]
        for scale in img_scale:
            for flip, direction in flip_args:
                _results = dict(results)
                _results['scale'] = scale
                _results['flip'] = flip
                _results['flip_direction'] = direction
                aug_data.append(self.transforms(_results))
        # list[dict] -> dict[list]
        aug_data_dict = {key: [] for key in aug_data[0]}
        for data in aug_data:
            for key, val in data.items():
                aug_data_dict[key].append(val)
        return aug_data_dict

    def __repr__(self):
        return (f'{self.__class__.__name__}(transforms={self.transforms}, '
                f'img_scale={self.img_scale}, flip={self.flip})')
