from .builder import (DATASETS, PIPELINES, build_dataset, build_dataloader,
                      DataLoader)
from .custom import CustomDataset
from .ade import ADE20KDataset
from .cityscapes import CityscapesDataset
from .voc import PascalVOCDataset
from .pascal_context import PascalContextDataset
from .dataset_wrappers import ConcatDataset, RepeatDataset
from .medical import (ChaseDB1Dataset, DRIVEDataset, HRFDataset,
                      STAREDataset)
from .coco_stuff import CocoStuffDataset, MapillaryDataset

__all__ = [
    'DATASETS', 'PIPELINES', 'build_dataset', 'build_dataloader',
    'DataLoader', 'CustomDataset', 'ADE20KDataset', 'CityscapesDataset',
    'PascalVOCDataset', 'PascalContextDataset', 'ConcatDataset',
    'RepeatDataset', 'ChaseDB1Dataset', 'DRIVEDataset', 'HRFDataset',
    'STAREDataset', 'CocoStuffDataset', 'MapillaryDataset'
]
