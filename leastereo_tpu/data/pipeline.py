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
) -> Iterator[dict]:
    """Yield batch dicts {left, right, disparity} of stacked numpy arrays.

    Shuffling is a seeded permutation per (seed, epoch); sample loading fans
    out over a thread pool (PIL/numpy release the GIL for decode/copy work).
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
):
    """Epoch factory: ``loader(epoch) -> iterator`` of device-resident batches."""

    def epoch_iter(epoch: int) -> Iterator[dict]:
        batches = batch_iterator(
            dataset,
            batch_size,
            shuffle=shuffle,
            epoch=epoch,
            seed=seed,
            num_workers=num_workers,
            drop_last=drop_last,
        )
        return prefetch_to_device(batches, sharding)

    epoch_iter.dataset = dataset
    epoch_iter.batch_size = batch_size
    epoch_iter.steps_per_epoch = (
        len(dataset) // batch_size if drop_last else -(-len(dataset) // batch_size)
    )
    return epoch_iter
