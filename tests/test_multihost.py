"""2-process multi-host smoke (VERDICT round-1 item 5): spawns two JAX
processes (4 virtual CPU devices each) sharing one coordination service,
runs distill train steps on host-sharded global batches, and checks the
loss trajectory matches a single-process run of the same global batch —
covering jax.distributed.initialize, make_array_from_process_local_data,
the GSPMD gradient/SyncBN reductions, and the fast_evaluate histogram
process_allgather (the reference's apis/test.py:104-235 machinery)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      'multihost_worker.py')


def _free_port():
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


def _run_workers(num_procs, timeout=540):
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)
    env['JAX_PLATFORMS'] = 'cpu'
    coord = f'localhost:{_free_port()}'
    procs = [subprocess.Popen(
        [sys.executable, WORKER, coord, str(num_procs), str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True)
        for pid in range(num_procs)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=timeout)
        assert p.returncode == 0, f'worker failed:\n{err[-3000:]}'
        # gloo chatter interleaves on stdout; find the JSON line
        line = next(ln for ln in out.strip().splitlines()
                    if ln.startswith('{'))
        outs.append(json.loads(line))
    return outs


def test_two_process_training_matches_single():
    multi = _run_workers(2)
    single = _run_workers(1)

    # both ranks observe the same (globally reduced) losses
    np.testing.assert_allclose(multi[0]['losses'], multi[1]['losses'],
                               rtol=1e-6)
    # and they equal the single-process run on the same global batch
    # (GSPMD reduction order differs -> fp tolerance)
    np.testing.assert_allclose(multi[0]['losses'], single[0]['losses'],
                               rtol=2e-4)
    # the REAL fast_evaluate at world=2: index space sharded across the
    # processes, histograms allgathered — both ranks report identical
    # metrics, and they equal each rank's full local evaluation
    for rank in (0, 1):
        for key in ('mIoU', 'mAcc', 'aAcc'):
            np.testing.assert_allclose(multi[rank]['eval'][key],
                                       multi[rank]['eval_local'][key],
                                       rtol=1e-6, err_msg=f'{rank}/{key}')
    assert multi[0]['eval'] == multi[1]['eval']
    # world=1 degenerate path agrees too
    for key in ('mIoU', 'mAcc', 'aAcc'):
        np.testing.assert_allclose(single[0]['eval'][key],
                                   single[0]['eval_local'][key], rtol=1e-6)
