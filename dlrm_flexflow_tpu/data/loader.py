"""Host-staged data loading + per-step sharded batch dispatch.

TPU-native analog of the reference loaders (reference: DLRM C++ DataLoader,
examples/cpp/DLRM/dlrm.cc:262-601 — full dataset into zero-copy host memory
once, then per-iteration index-launch copies into partitioned device batch
tensors; python/flexflow_dataloader.cc:543-741 SingleDataLoader). Here:
full dataset lives in host numpy ("ZCM"), batches are sliced and
device_put with the plan's batch sharding; `stack_batches` prepares
multi-step super-batches for the scanned train loop (one dispatch per K
steps, hiding per-call launch latency — the role Legion tracing played,
dlrm.cc:174-181).
"""
from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple

import numpy as np


class DataLoader:
    """next_batch iteration over a host-resident dataset.

    feeds: dict input-name -> [N, ...] numpy; labels: [N, ...].
    Per-epoch shuffling uses a numpy RNG (the reference shuffles via random
    sample indices in its dataloader tasks).
    """

    def __init__(
        self,
        feeds: Dict[str, np.ndarray],
        labels: np.ndarray,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_remainder: bool = True,
    ):
        self.feeds = feeds
        self.labels = labels
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        n = labels.shape[0]
        for k, v in feeds.items():
            assert v.shape[0] == n, f"{k} has {v.shape[0]} rows, labels {n}"
        assert drop_remainder, "partial batches unsupported (static shapes)"
        self.num_samples = n
        self.steps_per_epoch = n // batch_size
        assert self.steps_per_epoch > 0, "dataset smaller than one batch"
        self._order = np.arange(n)
        self._step = 0

    def reset(self) -> None:
        """New epoch: reshuffle (reference: next epoch re-seeds sample ids)."""
        self._step = 0
        if self.shuffle:
            self.rng.shuffle(self._order)

    def next_batch(self) -> Tuple[Dict[str, np.ndarray], np.ndarray]:
        """reference: DataLoader::next_batch (dlrm.cc:482). The permuted row
        gather runs in the native threaded batcher (native/ffdata) when the
        order is shuffled; contiguous (unshuffled) batches are free slices."""
        i = self._step % self.steps_per_epoch
        sl = self._order[i * self.batch_size : (i + 1) * self.batch_size]
        self._step += 1
        if not self.shuffle:
            lo, hi = int(sl[0]), int(sl[-1]) + 1
            return (
                {k: v[lo:hi] for k, v in self.feeds.items()},
                self.labels[lo:hi],
            )
        from .native_batcher import gather_batch

        keys = list(self.feeds.keys())
        arrays = [self.feeds[k] for k in keys] + [self.labels]
        outs = gather_batch(arrays, sl)
        return dict(zip(keys, outs[:-1])), outs[-1]

    def epoch(self) -> Iterator[Tuple[Dict[str, np.ndarray], np.ndarray]]:
        self.reset()
        for _ in range(self.steps_per_epoch):
            yield self.next_batch()

    def stacked_epoch(
        self, steps_per_call: int
    ) -> Iterator[Tuple[Dict[str, np.ndarray], np.ndarray]]:
        """Yield super-batches [K, B, ...] for the scanned train step; the
        epoch tail shorter than K is emitted as smaller stacks."""
        self.reset()
        bs = self.batch_size
        steps = self.steps_per_epoch
        done = 0
        while done < steps:
            k = min(steps_per_call, steps - done)
            sl = self._order[done * bs : (done + k) * bs]
            feeds = {
                v_k: v[sl].reshape((k, bs) + v.shape[1:])
                for v_k, v in self.feeds.items()
            }
            labels = self.labels[sl].reshape((k, bs) + self.labels.shape[1:])
            done += k
            yield feeds, labels
