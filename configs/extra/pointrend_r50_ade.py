# PointRend R50+FPN on ADE20K (ref configs/point_rend/pointrend_r50_512x512_160k_ade20k.py)
_base_ = [
    '../_base_/datasets/ade20k_repeat.py',
    '../_base_/default_runtime.py',
    '../_base_/schedules/schedule_160k.py',
]

from segdistill_tpu.zoo import pointrend_r50

model = pointrend_r50()
data = dict(samples_per_gpu=2)
evaluation = dict(interval=2000, metric='mIoU')
