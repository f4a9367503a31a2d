"""Cityscapes dataset incl. submission formatting
(ref contract: mmseg/datasets/cityscapes.py:50-91)."""

import os.path as osp

import numpy as np

from ..core.evaluation import get_classes, get_palette
from ..utils import image as imutil
from .builder import DATASETS
from .custom import CustomDataset


@DATASETS.register_module()
class CityscapesDataset(CustomDataset):

    CLASSES = tuple(get_classes('cityscapes'))
    PALETTE = get_palette('cityscapes')

    def __init__(self, **kwargs):
        super().__init__(img_suffix='_leftImg8bit.png',
                         seg_map_suffix='_gtFine_labelTrainIds.png',
                         **kwargs)

    @staticmethod
    def _convert_to_label_id(result):
        """trainId -> labelId for official submission (ref :33-47)."""
        # train-id -> cityscapes label id
        train2label = {0: 7, 1: 8, 2: 11, 3: 12, 4: 13, 5: 17, 6: 19,
                       7: 20, 8: 21, 9: 22, 10: 23, 11: 24, 12: 25, 13: 26,
                       14: 27, 15: 28, 16: 31, 17: 32, 18: 33}
        result = np.asarray(result)
        out = result.copy()
        for train_id, label_id in train2label.items():
            out[result == train_id] = label_id
        return out

    def results2img(self, results, imgfile_prefix, to_label_id=True):
        """Write submission pngs (ref :50-89)."""
        import os
        os.makedirs(imgfile_prefix, exist_ok=True)
        result_files = []
        for result, img_info in zip(results, self.img_infos):
            if to_label_id:
                result = self._convert_to_label_id(result)
            basename = osp.splitext(osp.basename(
                img_info['filename']))[0]
            png_path = osp.join(imgfile_prefix, f'{basename}.png')
            imutil.imwrite(result.astype(np.uint8), png_path)
            result_files.append(png_path)
        return result_files

    def format_results(self, results, imgfile_prefix=None,
                       to_label_id=True):
        """(ref :91-128)."""
        import tempfile
        tmp_dir = None
        if imgfile_prefix is None:
            tmp_dir = tempfile.TemporaryDirectory()
            imgfile_prefix = tmp_dir.name
        result_files = self.results2img(results, imgfile_prefix, to_label_id)
        return result_files, tmp_dir
