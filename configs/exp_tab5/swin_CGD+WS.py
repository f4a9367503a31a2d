# swin student x CGD+WS (ref contract: local_configs/exp_tab5/swin_CGD+WS.py)
_base_ = [
    '../_base_/datasets/ade20k_repeat.py',
    '../_base_/default_runtime.py',
    '../_base_/schedules/schedule_160k_adamw.py',
]

from segdistill_tpu.zoo import (segformer, swin_tiny_upernet, pspnet_r50, sd_model, distill_entry, distill_adamw, swin_adamw, poly_warmup_lr)

cfg_s = swin_tiny_upernet(pretrained='pretrained/swin_tiny_patch4_window7_224.pth')
cfg_t = segformer('b3')

model = sd_model(cfg_s, cfg_t, distillation=[
    distill_entry('CGDLossWS', {},
                  student_layer='decode_head.conv_seg'),
])

optimizer = swin_adamw()

lr_config = poly_warmup_lr()
data = dict(samples_per_gpu=2)
evaluation = dict(interval=2000, metric='mIoU')
