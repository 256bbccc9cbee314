"""Host->device input pipeline.

Replaces ``torch.utils.data.DataLoader`` (reference make_data_loaders.py:28-59)
with a TPU-idiomatic pipeline: a thread pool decodes/augments samples on the
host, batches are assembled as numpy, and a double-buffered prefetcher
``jax.device_put``\\ s them with an explicit sharding so the batch lands
already laid out over the mesh ``data`` axis — the transfer for step N+1
overlaps with compute for step N.
"""

from __future__ import annotations

import itertools
from collections.abc import Iterable, Iterator
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from .dataset import StereoListDataset

__all__ = ["batch_iterator", "prefetch_to_device", "make_loader"]


def batch_iterator(
    dataset: StereoListDataset,
    batch_size: int,
    *,
    shuffle: bool = True,
    epoch: int = 0,
    seed: int = 0,
    num_workers: int = 4,
    drop_last: bool = True,
    process_index: int = 0,
    process_count: int = 1,
) -> Iterator[dict]:
    """Yield batch dicts {left, right, disparity} of stacked numpy arrays.

    Shuffling is a seeded permutation per (seed, epoch); sample loading fans
    out over a thread pool (PIL/numpy release the GIL for decode/copy work).

    Multi-host: ``batch_size`` is the GLOBAL batch; with
    ``process_count > 1`` each host loads and yields only its
    ``batch_size / process_count`` contiguous rows of every global batch —
    the rows its addressable devices hold under a batch-axis NamedSharding
    (device order groups processes contiguously). The permutation is seeded
    identically on every host, so global batches are consistent.
    """
    order = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(np.random.SeedSequence([seed, epoch])).shuffle(order)
    n = len(order)
    if drop_last:
        n -= n % batch_size
        order = order[:n]
    if n == 0:
        return
    if process_count > 1:
        if batch_size % process_count:
            raise ValueError(f"global batch {batch_size} not divisible by {process_count} hosts")
        if not drop_last and n % batch_size:
            raise ValueError("multi-host loading requires drop_last")
        local = batch_size // process_count
        order = (
            order.reshape(-1, batch_size)[:, process_index * local : (process_index + 1) * local]
            .ravel()
        )
        batch_size = local

    def load(i):
        return dataset.__getitem__(int(i), epoch=epoch)

    def emit(samples):
        while True:
            chunk = list(itertools.islice(samples, batch_size))
            if len(chunk) < batch_size and (drop_last or not chunk):
                return
            yield {
                "left": np.stack([s.left for s in chunk]),
                "right": np.stack([s.right for s in chunk]),
                "disparity": np.stack([s.disparity for s in chunk]),
            }

    if num_workers <= 0:  # synchronous (debug / --workers 0)
        yield from emit(map(load, order))
        return
    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        yield from emit(pool.map(load, order))


def prefetch_to_device(it: Iterable[dict], sharding=None, depth: int = 2) -> Iterator[dict]:
    """Double-buffered async device transfer.

    ``jax.device_put`` with a NamedSharding splits the host batch over the
    mesh data axis without a gather; keeping ``depth`` batches in flight hides
    host decode + PCIe/DMA latency behind TPU compute.
    """
    import jax

    def put(batch):
        if sharding is None:
            return jax.device_put(batch)
        if jax.process_count() > 1:
            from ..parallel.multihost import make_global_batch

            return make_global_batch(batch, sharding)
        return jax.device_put(batch, jax.tree.map(lambda _: sharding, batch))

    queue: list = []
    it = iter(it)
    for batch in it:
        queue.append(put(batch))
        if len(queue) >= depth:
            yield queue.pop(0)
    while queue:
        yield queue.pop(0)


def make_loader(
    dataset: StereoListDataset,
    batch_size: int,
    *,
    shuffle: bool = True,
    seed: int = 0,
    num_workers: int = 4,
    sharding=None,
    drop_last: bool = True,
    process_index: int | None = None,
    process_count: int | None = None,
):
    """Epoch factory: ``loader(epoch) -> iterator`` of device-resident batches.

    ``batch_size`` is global; under multi-process JAX each host loads its own
    slice (``parallel/multihost.py``). Defaults pick up ``jax.process_*``
    lazily so single-host callers never touch the backend here."""

    def epoch_iter(epoch: int) -> Iterator[dict]:
        if process_index is None or process_count is None:
            import jax

            pi, pc = jax.process_index(), jax.process_count()
        else:
            pi, pc = process_index, process_count
        batches = batch_iterator(
            dataset,
            batch_size,
            shuffle=shuffle,
            epoch=epoch,
            seed=seed,
            num_workers=num_workers,
            drop_last=drop_last,
            process_index=pi,
            process_count=pc,
        )
        return prefetch_to_device(batches, sharding)

    epoch_iter.dataset = dataset
    epoch_iter.batch_size = batch_size
    epoch_iter.steps_per_epoch = (
        len(dataset) // batch_size if drop_last else -(-len(dataset) // batch_size)
    )
    return epoch_iter
