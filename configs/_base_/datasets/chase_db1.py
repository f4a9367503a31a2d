# CHASE_DB1 retinal vessels, 128x128 crops, RepeatDataset x40000
# (ref contract: local_configs/_base_/datasets/chase_db1.py)
dataset_type = 'ChaseDB1Dataset'
data_root = 'data/CHASE_DB1'
img_norm_cfg = dict(mean=[123.675, 116.28, 103.53],
                    std=[58.395, 57.12, 57.375], to_rgb=True)
crop_size = (128, 128)

train_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='LoadAnnotations'),
    dict(type='Resize', img_scale=(960, 999), ratio_range=(0.5, 2.0)),
    dict(type='RandomCrop', crop_size=crop_size, cat_max_ratio=0.75),
    dict(type='RandomFlip', prob=0.5),
    dict(type='PhotoMetricDistortion'),
    dict(type='Normalize', **img_norm_cfg),
    dict(type='Pad', size=crop_size, pad_val=0, seg_pad_val=255),
    dict(type='DefaultFormatBundle'),
    dict(type='Collect', keys=['img', 'gt_semantic_seg']),
]
test_pipeline = [
    dict(type='LoadImageFromFile'),
    dict(type='MultiScaleFlipAug',
         img_scale=(960, 999),
         flip=False,
         transforms=[
             # long+short sides snapped to /32 for shape-bucketed jit
             dict(type='AlignedResize', keep_ratio=True, size_divisor=32),
             dict(type='RandomFlip'),
             dict(type='Normalize', **img_norm_cfg),
             dict(type='ImageToTensor', keys=['img']),
             dict(type='Collect', keys=['img']),
         ])
]

data = dict(
    samples_per_gpu=4,
    workers_per_gpu=4,
    train=dict(type='RepeatDataset', times=40000,
               dataset=dict(type=dataset_type, data_root=data_root,
                            img_dir='images/training',
                            ann_dir='annotations/training',
                            pipeline=train_pipeline)),
    val=dict(type=dataset_type, data_root=data_root,
             img_dir='images/validation',
             ann_dir='annotations/validation',
             pipeline=test_pipeline),
    test=dict(type=dataset_type, data_root=data_root,
              img_dir='images/validation',
              ann_dir='annotations/validation',
              pipeline=test_pipeline))
