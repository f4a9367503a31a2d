"""Dataset/pipeline registries, dataset builder, and the TPU dataloader
(ref contract: mmseg/datasets/builder.py:21-169).

The torch DataLoader + DistributedSampler stack becomes a host-sharded
prefetching iterator: each JAX process loads only its shard of the global
batch (``jax.process_index()``), samples are decoded/augmented by a thread
pool (cv2 releases the GIL), and ready numpy batches sit in a bounded queue
for the train loop to ``device_put`` against the mesh sharding.
"""

import copy
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from functools import partial

import numpy as np

from ..registry import Registry, build_from_cfg

DATASETS = Registry('dataset')
PIPELINES = Registry('pipeline')


def getitem_with_rng(dataset, idx, rng):
    """Fetch ``dataset[idx]`` passing the per-sample RNG when the dataset
    supports it (framework datasets/wrappers do; ad-hoc test datasets may
    not — they fall back to index-only access)."""
    import inspect
    try:
        accepts = 'rng' in inspect.signature(
            dataset.__getitem__).parameters
    except (TypeError, ValueError):
        accepts = False
    if accepts:
        return dataset.__getitem__(idx, rng=rng)
    return dataset[idx]


def _concat_dataset(cfg, default_args=None):
    """Expand list-valued img_dir/ann_dir/split into a ConcatDataset
    (ref builder.py:34-58)."""
    from .dataset_wrappers import ConcatDataset
    img_dir = cfg['img_dir']
    ann_dir = cfg.get('ann_dir', None)
    split = cfg.get('split', None)
    num_img_dir = len(img_dir) if isinstance(img_dir, (list, tuple)) else 1
    if ann_dir is not None:
        num_ann_dir = len(ann_dir) if isinstance(ann_dir, (list, tuple)) \
            else 1
    else:
        num_ann_dir = 0
    if split is not None:
        num_split = len(split) if isinstance(split, (list, tuple)) else 1
    else:
        num_split = 0
    if num_img_dir > 1:
        assert num_ann_dir in (num_img_dir, 0)
        assert num_split in (num_img_dir, 0)
    else:
        assert num_split == num_ann_dir or num_ann_dir <= 1
    num_dset = max(num_split, num_img_dir)

    datasets = []
    for i in range(num_dset):
        data_cfg = copy.deepcopy(cfg)
        if isinstance(img_dir, (list, tuple)):
            data_cfg['img_dir'] = img_dir[i]
        if isinstance(ann_dir, (list, tuple)):
            data_cfg['ann_dir'] = ann_dir[i]
        if isinstance(split, (list, tuple)):
            data_cfg['split'] = split[i]
        datasets.append(build_dataset(data_cfg, default_args))
    return ConcatDataset(datasets)


def build_dataset(cfg, default_args=None):
    """(ref builder.py:61-75)."""
    from .dataset_wrappers import ConcatDataset, RepeatDataset
    if isinstance(cfg, (list, tuple)):
        return ConcatDataset([build_dataset(c, default_args) for c in cfg])
    if cfg['type'] == 'RepeatDataset':
        return RepeatDataset(build_dataset(cfg['dataset'], default_args),
                             cfg['times'])
    if cfg['type'] == 'ConcatDataset':
        return ConcatDataset(
            [build_dataset(c, default_args) for c in cfg['datasets']])
    if isinstance(cfg.get('img_dir'), (list, tuple)) or isinstance(
            cfg.get('split'), (list, tuple)):
        return _concat_dataset(cfg, default_args)
    return build_from_cfg(cfg, DATASETS, default_args)


def default_collate(samples):
    """Stack same-shaped arrays; keep metas as a list of dicts."""
    batch = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if key == 'img_metas':
            batch[key] = vals
        elif isinstance(vals[0], np.ndarray):
            batch[key] = np.stack(vals, axis=0)
        else:
            batch[key] = vals
    return batch


class DataLoader:
    """Host-sharded prefetching loader.

    * train (``shuffle=True``): infinite stream; a fresh global permutation
      per epoch (seeded by epoch — identical on all hosts), each host takes
      the ``process_index``-th slice of every global batch.
    * eval: one sequential pass, per-host sharding of the index space,
      ``drop_last=False``.
    """

    def __init__(self, dataset, samples_per_gpu=1, num_workers=2,
                 shuffle=True, seed=42, drop_last=True, process_index=None,
                 process_count=None, prefetch=4, infinite=None):
        import jax
        self.dataset = dataset
        self.batch_size = samples_per_gpu
        self.num_workers = max(num_workers, 1)
        self.shuffle = shuffle
        self.seed = seed if seed is not None else 0
        self.drop_last = drop_last
        self.rank = process_index if process_index is not None \
            else jax.process_index()
        self.world = process_count if process_count is not None \
            else jax.process_count()
        self.prefetch = prefetch
        self.infinite = shuffle if infinite is None else infinite

    def __len__(self):
        n = len(self.dataset)
        per_host = self.batch_size
        global_batch = per_host * self.world
        if self.drop_last:
            return n // global_batch
        return (n + global_batch - 1) // global_batch

    def _epoch_indices(self, epoch):
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + epoch)
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        global_batch = self.batch_size * self.world
        if self.drop_last:
            order = order[:n // global_batch * global_batch]
        # host takes a strided slice of each global batch
        return [order[i + self.rank * self.batch_size:
                      i + (self.rank + 1) * self.batch_size]
                for i in range(0, len(order), global_batch)]

    def _load(self, idx, sample_seed):
        # one private RandomState per sample: deterministic by
        # (seed, position-in-stream) and safe under thread concurrency —
        # seeding the process-global numpy RNG from pool threads (the
        # reference's per-worker-process model, ref builder.py:155-169)
        # would race here
        rng = np.random.RandomState(sample_seed) \
            if sample_seed is not None else None
        return getitem_with_rng(self.dataset, int(idx), rng)

    def _collate(self, samples, seeds):
        return default_collate(samples)

    def __iter__(self):
        # eager (non-generator) so the empty-epoch check raises at iter()
        # time, not at the first next()
        n = len(self.dataset)
        global_batch = self.batch_size * self.world
        if self.drop_last and n < global_batch:
            # would yield ZERO batches per epoch — the producer would spin
            # through empty epochs forever while the consumer blocks
            raise ValueError(
                f'dataset has {n} samples but the global batch is '
                f'{global_batch} ({self.batch_size}/host x {self.world} '
                f'host(s)) with drop_last=True: no full batch can ever '
                f'be formed. Lower samples_per_gpu or grow the dataset.')
        return self._iterate()

    def _iterate(self):
        q = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            epoch = 0
            counter = 0
            with ThreadPoolExecutor(self.num_workers) as pool:
                while not stop.is_set():
                    for batch_idx in self._epoch_indices(epoch):
                        if stop.is_set():
                            return
                        if len(batch_idx) == 0:
                            continue
                        # SeedSequence keys (seed, rank, stream position):
                        # rank streams can never collide, unlike additive
                        # offsets which alias once counter > offset stride
                        seeds = [int(np.random.SeedSequence(
                                     (self.seed, self.rank, counter + j)
                                     ).generate_state(1)[0])
                                 if self.shuffle else None
                                 for j in range(len(batch_idx))]
                        counter += len(batch_idx)
                        samples = list(pool.map(self._load, batch_idx,
                                                seeds))
                        q.put(self._collate(samples, seeds))
                    if not self.infinite:
                        q.put(None)
                        return
                    epoch += 1

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()


def _load_only_view(dataset):
    """A shallow copy of ``dataset`` whose pipeline keeps only the loading
    transforms — the raw (img, gt) source for the batch-level augmentation
    backends."""
    from .dataset_wrappers import ConcatDataset, RepeatDataset
    from .pipelines import Compose
    if isinstance(dataset, RepeatDataset):
        view = copy.copy(dataset)
        view.dataset = _load_only_view(dataset.dataset)
        return view
    if isinstance(dataset, ConcatDataset):
        view = copy.copy(dataset)
        view.datasets = [_load_only_view(d) for d in dataset.datasets]
        return view
    view = copy.copy(dataset)
    loads = [t for t in dataset.pipeline.transforms
             if type(t).__name__ in ('LoadImageFromFile',
                                     'LoadAnnotations')]
    if len(loads) != 2:
        raise ValueError(
            "loader_backend='native'/'device' needs a train pipeline "
            'containing LoadImageFromFile + LoadAnnotations; got '
            f'{[type(t).__name__ for t in dataset.pipeline.transforms]}')
    view.pipeline = Compose(loads)
    return view


class NativeAugDataLoader(DataLoader):
    """``loader_backend='native'``: raw decode on the thread pool, then ONE
    OpenMP batch call into the C++ core (native/fastaug.cpp) for the whole
    Resize/RandomCrop/RandomFlip/PhotoMetricDistortion/Normalize chain.

    Deterministic by (seed, rank, stream position) like the host loader,
    on the core's own RNG stream (op semantics match the host pipeline;
    the exact random sequence is backend-specific, same as the reference's
    worker-dependent numpy streams)."""

    def __init__(self, dataset, aug_cfg=None, **kwargs):
        from ..native import FastAugBatch
        super().__init__(_load_only_view(dataset), **kwargs)
        self.aug = FastAugBatch(**(aug_cfg or {}))

    def _load(self, idx, sample_seed):
        res = getitem_with_rng(self.dataset, int(idx), None)
        img = res['img'][..., ::-1]  # BGR (cv2 load) -> RGB
        return (np.ascontiguousarray(img, np.uint8),
                np.ascontiguousarray(res['gt_semantic_seg'], np.uint8))

    def _collate(self, samples, seeds):
        batch_seed = int(seeds[0]) if seeds and seeds[0] is not None else 0
        imgs, gts = self.aug(samples, seed=batch_seed)
        return {'img': imgs, 'gt_semantic_seg': gts}


class DeviceAugDataLoader(DataLoader):
    """``loader_backend='device'``: host decode + fixed-shape canvas
    (PrepareCanvas), augmentation as one jitted XLA program per batch
    (data/device_aug.py). Host threads only decode and pad."""

    def __init__(self, dataset, aug_cfg=None, **kwargs):
        from ..data.device_aug import DeviceAugPipeline, PrepareCanvas
        super().__init__(_load_only_view(dataset), **kwargs)
        aug_cfg = dict(aug_cfg or {})
        canvas_cfg = {k: aug_cfg.pop(k) for k in ('img_scale', 'canvas')
                      if k in aug_cfg}
        self.canvas = PrepareCanvas(**canvas_cfg)
        self.aug = DeviceAugPipeline(**aug_cfg)

    def _load(self, idx, sample_seed):
        res = getitem_with_rng(self.dataset, int(idx), None)
        res['img'] = np.ascontiguousarray(res['img'][..., ::-1])  # ->RGB
        return self.canvas(res)

    def _collate(self, samples, seeds):
        import jax
        batch_seed = int(seeds[0]) if seeds and seeds[0] is not None else 0
        imgs = np.stack([s['img'] for s in samples])
        gts = np.stack([s['gt_semantic_seg'] for s in samples])
        hw = np.stack([s['valid_hw'] for s in samples])
        out_img, out_gt = self.aug(jax.random.key(batch_seed), imgs, gts,
                                   hw)
        return {'img': out_img, 'gt_semantic_seg': out_gt}


LOADER_BACKENDS = {
    'host': DataLoader,
    'native': NativeAugDataLoader,
    'device': DeviceAugDataLoader,
}


def build_dataloader(dataset, samples_per_gpu, workers_per_gpu,
                     num_gpus=1, dist=True, shuffle=True, seed=None,
                     drop_last=True, loader_backend='host', aug_cfg=None,
                     **kwargs):
    """(ref builder.py:78-152). ``samples_per_gpu`` keeps its reference
    meaning: per-device batch; the loader yields the per-host share
    (devices-per-host x samples_per_gpu).

    ``loader_backend`` selects the augmentation engine for training
    loaders: 'host' (per-sample python pipeline, the parity path),
    'native' (C++ batch core) or 'device' (jitted on-device pipeline).
    """
    import jax
    local_devices = jax.local_device_count()
    per_host = samples_per_gpu * (local_devices if dist else num_gpus)
    if loader_backend not in LOADER_BACKENDS:
        raise ValueError(f'unknown loader_backend {loader_backend!r}; '
                         f'choose from {sorted(LOADER_BACKENDS)}')
    if loader_backend != 'host' and not shuffle:
        raise ValueError('native/device loader backends are train-only '
                         '(shuffle=True)')
    cls = LOADER_BACKENDS[loader_backend]
    if loader_backend != 'host':
        kwargs['aug_cfg'] = aug_cfg
    return cls(dataset, samples_per_gpu=per_host,
               num_workers=workers_per_gpu, shuffle=shuffle,
               seed=seed if seed is not None else 42,
               drop_last=drop_last and shuffle, **kwargs)
