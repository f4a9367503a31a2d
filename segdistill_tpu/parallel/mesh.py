"""Device-mesh data parallelism.

Replaces the reference's entire distributed stack — DDP gradient all-reduce,
SyncBN NCCL sync, log-var all_reduce, DistributedSampler
(SURVEY §2.10) — with one 1-D ``jax.sharding.Mesh`` over the 'data' axis:

* the global batch is sharded over 'data' (`shard_batch`);
* params/teacher variables are replicated;
* inside the single jitted train step, every cross-batch reduction (loss
  mean, BN statistics, gradients) is lowered by GSPMD to ICI collectives.

No DDP object, no ``find_unused_parameters``, no explicit all_reduce calls.
Multi-host: each process feeds its local shard via
``jax.make_array_from_process_local_data``.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(devices=None, axis_name='data'):
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh, axis_name='data'):
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh, axis_name='data'):
    """numpy batch dict -> global jax.Arrays sharded over the batch axis.

    Single-host: a plain device_put. Multi-host: the local numpy arrays are
    this host's shard of the global batch.
    """
    sharding = batch_sharding(mesh, axis_name)

    def put(x):
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(put, batch)


def shard_stacked_batch(batch, mesh, axis_name='data'):
    """Like :func:`shard_batch` for (k, B, ...) step-stacked batches
    (``build_multi_train_step``): the scan axis k is replicated, the batch
    axis (dim 1) is sharded over the mesh."""
    sharding = NamedSharding(mesh, P(None, axis_name))

    def put(x):
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(put, batch)


def replicate(tree, mesh):
    sharding = replicated_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)
    # multi-host: every process holds the identical full value; build the
    # global replicated array from the process-local copy. Typed PRNG keys
    # are bitcast through their uint32 key data.
    def rep(x):
        if hasattr(x, 'dtype') and jax.dtypes.issubdtype(
                x.dtype, jax.dtypes.prng_key):
            data = jax.make_array_from_process_local_data(
                sharding, np.asarray(jax.random.key_data(x)))
            return jax.random.wrap_key_data(data,
                                            impl=jax.random.key_impl(x))
        return jax.make_array_from_process_local_data(sharding,
                                                      np.asarray(x))

    return jax.tree.map(rep, tree)


def unreplicate(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)
