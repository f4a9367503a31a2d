# Plain Segformer-B5 ADE20K 160k recipe
# (ref contract: local_configs/segformer/B5/segformer.b5.512x512.ade.160k.py)
_base_ = [
    '../_base_/datasets/ade20k_repeat.py',
    '../_base_/default_runtime.py',
    '../_base_/schedules/schedule_160k_adamw.py',
]

from segdistill_tpu.zoo import segformer, distill_adamw, poly_warmup_lr

model = segformer('b5', pretrained='pretrained/mit_b5.pth')

optimizer = distill_adamw()

lr_config = poly_warmup_lr()
data = dict(samples_per_gpu=2)
evaluation = dict(interval=2000, metric='mIoU')
