# PSANet R50-d8 on ADE20K (ref configs/psanet/psanet_r50-d8_512x512_80k_ade20k.py)
_base_ = [
    '../_base_/datasets/ade20k_repeat.py',
    '../_base_/default_runtime.py',
    '../_base_/schedules/schedule_160k.py',
]

from segdistill_tpu.zoo import psanet_r50

model = psanet_r50()
data = dict(samples_per_gpu=2)
evaluation = dict(interval=2000, metric='mIoU')
