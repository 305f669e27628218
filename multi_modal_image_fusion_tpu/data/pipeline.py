"""Host->device input pipeline (replaces torch DataLoader workers,
reference train.py:207-222).

A background thread assembles NHWC numpy batches and eagerly dispatches
``jax.device_put`` so transfers overlap the device step (double buffering);
the consumer pops ready device batches from a bounded queue. With a sharding,
batches land directly in the data-parallel layout (no per-rank DataLoader or
DistributedSampler needed — the global batch is sharded over the mesh).
"""

import queue
import threading

import jax
import numpy as np


def _to_batch(items):
    """items: list of HW arrays or tuples of HW arrays -> NHWC array(s)."""
    if isinstance(items[0], tuple):
        n = len(items[0])
        return tuple(
            np.stack([it[i] for it in items])[..., None] for i in range(n))
    return np.stack(items)[..., None]


class Feeder:
    """Iterates a dataset in batches of NHWC device arrays.

    Args:
      dataset: indexable dataset returning HW arrays or tuples of them.
      batch_size: global batch size.
      shuffle: reshuffle indices each epoch (numpy RNG, seeded).
      drop_last: drop the final partial batch (recommended for jit'd train
        loops: keeps shapes static).
      sharding: optional `jax.sharding.Sharding` for the batch (data-parallel
        placement); defaults to the default device.
      prefetch: queue depth of in-flight device batches.
    """

    def __init__(self,
                 dataset,
                 batch_size,
                 shuffle=False,
                 drop_last=False,
                 sharding=None,
                 seed=0,
                 prefetch=2,
                 with_mask=False,
                 workers=0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.sharding = sharding
        self.prefetch = prefetch
        self.with_mask = with_mask
        # workers>0: item loads (imread + augment) within a batch fan out
        # over a thread pool (cv2/numpy release the GIL), covering the
        # reference's DataLoader num_workers=4*world_size (train.py:
        # 207-222) for full-res batches where one producer thread would
        # bottleneck a real TPU host
        self.workers = workers
        if workers:
            from concurrent.futures import ThreadPoolExecutor
            self._pool = ThreadPoolExecutor(max_workers=workers)
        else:
            self._pool = None
        self._rng = np.random.RandomState(seed)
        self._epoch = 0

    def set_epoch(self, epoch):
        self._epoch = epoch

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_shard_count(self):
        """Devices sharding the BATCH axis (spec[0]); wrap-padding to a
        device multiple only applies when the batch axis is actually
        sharded — under height sharding (P(None, 'data'), parallel/
        spatial.py) any batch size is placeable as-is."""
        sh = self.sharding
        spec = getattr(sh, "spec", None)
        if not spec or spec[0] is None:
            return 1
        ax = spec[0]
        axes = ax if isinstance(ax, tuple) else (ax,)
        n = 1
        for a in axes:
            n *= int(sh.mesh.shape[a])
        return n

    def _leaf_sharding(self, x):
        """Per-leaf placement: leaves with fewer dims than the spec
        (e.g. a (N,) mask under the height-sharded P(None, 'data') image
        spec) replicate instead of erroring. Sharded dims are checked
        for divisibility up front — device_put's own error surfaces from
        the producer thread long after startup with no hint."""
        sh = self.sharding
        spec = getattr(sh, "spec", None)
        if spec is None:
            return sh
        if getattr(x, "ndim", len(spec)) < len(spec):
            from jax.sharding import NamedSharding, PartitionSpec
            return NamedSharding(sh.mesh, PartitionSpec())
        for dim, ax in enumerate(spec):
            if ax is None:
                continue
            axes = ax if isinstance(ax, tuple) else (ax,)
            n = 1
            for a in axes:
                n *= int(sh.mesh.shape[a])
            if x.shape[dim] % n:
                raise ValueError(
                    f"batch dim {dim} (size {x.shape[dim]}) is not "
                    f"divisible by the {n}-device mesh axis {ax!r}; "
                    f"for height-sharded training (--spatial) pick N "
                    f"dividing the image height, or use --fix_size / "
                    f"--use_patches for a divisible static size")
        return sh

    def _batches(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(idx)
        stop = (n // self.batch_size) * self.batch_size if self.drop_last \
            else n
        ndev = self._batch_shard_count()
        for i in range(0, stop, self.batch_size):
            take = idx[i:i + self.batch_size]
            n_true = len(take)
            if len(take) % ndev:
                # wrap-pad the final partial batch to a device multiple
                # (torch DistributedSampler semantics); np.resize repeats
                # cyclically, so it also covers pad > len(take)
                pad = ndev - len(take) % ndev
                take = np.resize(take, len(take) + pad)
            if self._pool is not None:
                items = list(self._pool.map(
                    lambda j: self.dataset[int(j)], take))
            else:
                items = [self.dataset[int(j)] for j in take]
            batch = _to_batch(items)
            if self.with_mask:
                mask = np.zeros((len(take),), np.float32)
                mask[:n_true] = 1.0
                yield batch, mask, n_true
            else:
                yield batch

    def __iter__(self):
        q = queue.Queue(maxsize=self.prefetch)
        sentinel = object()

        def place(batch):
            if self.sharding is not None:
                from ..parallel.mesh import place_sharded
                return jax.tree.map(
                    lambda x: place_sharded(x, self._leaf_sharding(x)),
                    batch)
            return jax.tree.map(jax.device_put, batch)

        def produce():
            try:
                for item in self._batches():
                    if self.with_mask:
                        batch, mask, n_true = item
                        q.put((place((batch, mask))) + (n_true,))
                    else:
                        q.put(place(item))
            except Exception as e:  # surface worker errors to the consumer
                q.put(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            if isinstance(item, Exception):
                raise item
            yield item
        t.join()
