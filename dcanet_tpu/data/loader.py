"""Host-side batching, per-host sharding, device prefetch, eval padding.

Replaces the reference's torch DataLoader (+ its vendored old-torch copy,
models/lib/utils/data/dataloader.py) and its unused DistributedSampler
(models/lib/utils/data/distributed.py:7-57):

  * `shard_for_host`: deterministic per-host index slicing for multi-host
    SPMD — each process feeds only its shard of the global batch.
  * `Loader`: epoch-seeded shuffling, thread-pool decode (PIL releases the
    GIL), fixed-shape batches, and double-buffered `jax.device_put` prefetch
    so host decode overlaps device compute.
  * `pad_to_multiple`: the reference's two eval padding policies — zero-pad
    top/right to a multiple of 16 (main_dca.py:153-166) or replicate-pad
    (InputPadder, dataloader/datasets.py:691-705).
"""

from __future__ import annotations

import concurrent.futures as cf
import threading
from typing import Dict, Iterator, Optional, Sequence, Tuple

import numpy as np


def shard_for_host(
    num_samples: int,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
    seed: int = 0,
    shuffle: bool = True,
) -> np.ndarray:
    """Rank-sharded, epoch-seeded permutation (DistributedSampler semantics)."""
    import jax

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    idx = np.arange(num_samples)
    if shuffle:
        idx = np.random.default_rng(seed).permutation(idx)
    # pad to a multiple of pc so every host sees the same number of steps
    pad = (-len(idx)) % pc
    if pad:
        idx = np.concatenate([idx, idx[:pad]])
    return idx[pi::pc]


def pad_to_multiple(
    img: np.ndarray, multiple: int = 16, mode: str = "top_right_zero"
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Pad (H, W, ...) to multiples of `multiple`.

    top_right_zero: zero-pad rows on top, cols on the right (main_dca eval).
    replicate:      edge-pad split top/bottom + left/right (InputPadder).
    Returns (padded, (top_pad, right_pad)) for top_right_zero, or the full
    4-tuple pads via `pad_to_multiple_replicate` below.
    """
    h, w = img.shape[:2]
    top = (multiple - h % multiple) % multiple
    right = (multiple - w % multiple) % multiple
    if mode == "top_right_zero":
        pads = [(top, 0), (0, right)] + [(0, 0)] * (img.ndim - 2)
        return np.pad(img, pads), (top, right)
    if mode == "replicate":
        pads = [(top // 2, top - top // 2), (right // 2, right - right // 2)]
        pads += [(0, 0)] * (img.ndim - 2)
        return np.pad(img, pads, mode="edge"), (top, right)
    raise ValueError(mode)


def unpad(disp: np.ndarray, pads: Tuple[int, int]) -> np.ndarray:
    """Strip top rows / right cols added by pad_to_multiple(top_right_zero)."""
    top, right = pads
    h, w = disp.shape[-2:]
    return disp[..., top:, : w - right if right else w]


class Loader:
    """Iterates fixed-shape batches with background decode + prefetch.

    dataset: StereoDataset-like (len + __getitem__ -> dict of arrays).
    All samples in a batch must share shapes (training crops do; for eval use
    batch_size=1 or pre-padded datasets).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 8,
        drop_last: bool = True,
        per_host: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.per_host = per_host
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        if hasattr(self.dataset, "reseed"):
            self.dataset.reseed(self.seed + epoch)

    def __len__(self):
        import jax

        n = len(self.dataset)
        if self.per_host:
            n = -(-n // jax.process_count()) if not self.drop_last else n // jax.process_count()
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.per_host:
            indices = shard_for_host(
                len(self.dataset), seed=self.seed + self.epoch, shuffle=self.shuffle
            )
        else:
            indices = np.arange(len(self.dataset))
            if self.shuffle:
                indices = np.random.default_rng(self.seed + self.epoch).permutation(indices)

        nb = len(indices) // self.batch_size if self.drop_last else -(
            -len(indices) // self.batch_size
        )
        # Separate pools: `batch_pool` (1 thread) assembles the next batch
        # while the caller consumes the current one; `decode_pool` parallelizes
        # per-sample decode. (A single shared pool deadlocks: fetch tasks
        # would starve their own inner map.)
        with cf.ThreadPoolExecutor(max_workers=self.num_workers) as decode_pool, \
                cf.ThreadPoolExecutor(max_workers=1) as batch_pool:

            def fetch(bi):
                batch_idx = indices[bi * self.batch_size : (bi + 1) * self.batch_size]
                samples = list(decode_pool.map(self.dataset.__getitem__, batch_idx))
                return {
                    k: np.stack([s[k] for s in samples]) for k in samples[0]
                }

            pending = None
            for bi in range(nb):
                fut = batch_pool.submit(fetch, bi)
                if pending is not None:
                    yield pending.result()
                pending = fut
            if pending is not None:
                yield pending.result()


def device_prefetch(iterator, sharding=None, depth: int = 2):
    """Move batches to device ahead of consumption (double buffering).

    With `sharding` (a NamedSharding over the mesh's data axis) batches land
    pre-sharded. Multi-host: the iterator yields this process's shard (see
    `shard_for_host`) and the global array is assembled with
    `make_array_from_process_local_data` — the global batch is
    per_host_batch * process_count.
    """
    import collections

    import jax

    queue = collections.deque()

    def put(batch):
        if sharding is not None:
            if jax.process_count() > 1:
                return jax.tree.map(
                    lambda x: jax.make_array_from_process_local_data(sharding, x),
                    batch,
                )
            return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    it = iter(iterator)
    try:
        for _ in range(depth):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        batch = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield batch
