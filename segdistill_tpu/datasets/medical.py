"""Retina-vessel segmentation datasets
(ref contracts: mmseg/datasets/{chase_db1,drive,hrf,stare}.py)."""

from .builder import DATASETS
from .custom import CustomDataset

_VESSEL_CLASSES = ('background', 'vessel')
_VESSEL_PALETTE = [[120, 120, 120], [6, 230, 230]]


@DATASETS.register_module()
class ChaseDB1Dataset(CustomDataset):
    CLASSES = _VESSEL_CLASSES
    PALETTE = _VESSEL_PALETTE

    def __init__(self, **kwargs):
        super().__init__(img_suffix='.png', seg_map_suffix='.png',
                         reduce_zero_label=False, **kwargs)


@DATASETS.register_module()
class DRIVEDataset(CustomDataset):
    CLASSES = _VESSEL_CLASSES
    PALETTE = _VESSEL_PALETTE

    def __init__(self, **kwargs):
        super().__init__(img_suffix='.png', seg_map_suffix='.png',
                         reduce_zero_label=False, **kwargs)


@DATASETS.register_module()
class HRFDataset(CustomDataset):
    CLASSES = _VESSEL_CLASSES
    PALETTE = _VESSEL_PALETTE

    def __init__(self, **kwargs):
        super().__init__(img_suffix='.png', seg_map_suffix='.png',
                         reduce_zero_label=False, **kwargs)


@DATASETS.register_module()
class STAREDataset(CustomDataset):
    CLASSES = _VESSEL_CLASSES
    PALETTE = _VESSEL_PALETTE

    def __init__(self, **kwargs):
        super().__init__(img_suffix='.png', seg_map_suffix='.png',
                         reduce_zero_label=False, **kwargs)
