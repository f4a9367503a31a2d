# Pascal VOC 2012 + SBD aug labels
# (ref contract: local_configs/_base_/datasets/pascal_voc12_aug.py)
_base_ = './pascal_voc12.py'
data = dict(
    train=dict(
        ann_dir=['SegmentationClass', 'SegmentationClassAug'],
        split=['ImageSets/Segmentation/train.txt',
               'ImageSets/Segmentation/aug.txt']))
