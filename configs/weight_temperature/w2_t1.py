# CGD alpha/tau ablation: alpha=2, tau=1
# (ref contract: local_configs/Weight_Temperature/w=2_t=1.py)
_base_ = [
    '../_base_/datasets/ade20k_repeat.py',
    '../_base_/default_runtime.py',
    '../_base_/schedules/schedule_160k_adamw.py',
]

from segdistill_tpu.zoo import (segformer, sd_model, distill_entry,
                                distill_adamw, poly_warmup_lr)

cfg_s = segformer('b0', pretrained='pretrained/mit_b0.pth')
cfg_t = segformer('b3')

model = sd_model(cfg_s, cfg_t, distillation=[
    distill_entry('CGDLoss', {'alpha': 2, 'tau': 1}),
])

optimizer = distill_adamw()

lr_config = poly_warmup_lr()
data = dict(samples_per_gpu=2)
evaluation = dict(interval=2000, metric='mIoU')
