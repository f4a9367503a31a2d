"""Pascal VOC dataset (ref contract: mmseg/datasets/voc.py)."""

from ..core.evaluation import get_classes, get_palette
from .builder import DATASETS
from .custom import CustomDataset


@DATASETS.register_module()
class PascalVOCDataset(CustomDataset):

    CLASSES = tuple(get_classes('voc'))
    PALETTE = get_palette('voc')

    def __init__(self, split, **kwargs):
        super().__init__(img_suffix='.jpg', seg_map_suffix='.png',
                         split=split, **kwargs)
        assert self.split is not None
