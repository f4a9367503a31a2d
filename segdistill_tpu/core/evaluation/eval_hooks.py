"""Periodic-evaluation hook for the training loop
(ref contract: mmseg/core/evaluation/eval_hooks.py:7-107).

The reference's EvalHook/DistEvalHook pair collapses into one class: under
the single-controller JAX model there is no rank-0-only evaluation — every
host runs the same program and metric histograms are globally reduced.
"""


class EvalHook:

    def __init__(self, eval_fn, interval=2000, by_epoch=False, **eval_kwargs):
        if by_epoch:
            raise NotImplementedError('iteration-based training only')
        self.eval_fn = eval_fn
        self.interval = interval
        self.eval_kwargs = eval_kwargs
        self.latest_results = None
        self._prev_step = None

    def after_train_iter(self, runner_state):
        step = int(runner_state.step)
        # interval-crossing, not exact-multiple: under steps-per-dispatch
        # chunking (IterBasedRunner) the hook sees only chunk-end steps
        prev = self._prev_step if self._prev_step is not None else step - 1
        self._prev_step = step
        if step // self.interval == prev // self.interval:
            return None
        self.latest_results = self.eval_fn(runner_state, **self.eval_kwargs)
        return self.latest_results
