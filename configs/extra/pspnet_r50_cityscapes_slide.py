# PSPNet-R50-d8 on Cityscapes with SLIDE inference
# (ref contract: configs/pspnet/pspnet_r50-d8_512x1024_40k_cityscapes.py;
# slide eval: the mode every reference PSP distill config declares)
_base_ = [
    '../_base_/datasets/cityscapes.py',
    '../_base_/default_runtime.py',
    '../_base_/schedules/schedule_40k.py',
]

from segdistill_tpu.zoo import pspnet_r50

norm_cfg = dict(type='SyncBN', requires_grad=True)
model = pspnet_r50(num_classes=19)
model['auxiliary_head'] = dict(
    type='FCNHead', in_channels=1024, in_index=2, channels=256,
    num_convs=1, concat_input=False, dropout_ratio=0.1, num_classes=19,
    norm_cfg=norm_cfg, align_corners=False,
    loss_decode=dict(type='CrossEntropyLoss', use_sigmoid=False,
                     loss_weight=0.4))
model['train_cfg'] = dict()
model['test_cfg'] = dict(mode='slide', crop_size=(769, 769),
                         stride=(513, 513))
