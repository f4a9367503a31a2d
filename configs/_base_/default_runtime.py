# (ref contract: local_configs/_base_/default_runtime.py)
# dist_params/cudnn_benchmark have no TPU counterpart: the mesh replaces
# NCCL and XLA autotuning replaces cudnn_benchmark.
log_config = dict(interval=50, hooks=[dict(type='TextLoggerHook',
                                           by_epoch=False)])
log_level = 'INFO'
load_from = None
resume_from = None
workflow = [('train', 1)]
