"""Training state (replaces the mmcv runner's mutable model/optimizer pair).

One pytree: student params + optimizer state + BN stats + step + PRNG key.
The frozen teacher variables are NOT part of the state — they are donated
constants of the jitted step (no optimizer state, no checksum churn).
"""

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    model_state: Any  # {'batch_stats': ...} of the student
    rng: jnp.ndarray


def create_train_state(rng, student_variables, tx):
    params = student_variables['params']
    model_state = {k: v for k, v in student_variables.items()
                   if k not in ('params', 'feats')}
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        model_state=model_state,
        rng=rng)
