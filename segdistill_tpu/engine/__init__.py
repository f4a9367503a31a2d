from .optimizer import build_optimizer, paramwise_labels
from .lr_schedule import build_lr_schedule
from .train_state import TrainState, create_train_state
from .runner import (IterBasedRunner, build_multi_train_step,
                     build_train_step)
from .checkpoint import (save_checkpoint, load_checkpoint, load_meta,
                         load_weights, resume_latest)

__all__ = [
    'build_optimizer', 'paramwise_labels', 'build_lr_schedule', 'TrainState',
    'create_train_state', 'IterBasedRunner', 'build_train_step',
    'build_multi_train_step',
    'save_checkpoint', 'load_checkpoint', 'load_meta', 'load_weights',
    'resume_latest'
]
