"""Host-side array datasets and epoch iterators.

Replaces the reference's torch ``TensorDataset``/``DataLoader`` pairs
with plain numpy arrays plus a deterministic batched iterator — the
TPU-idiomatic shape: data lives in host RAM as contiguous arrays,
batches are sliced with numpy indexing, and the trainer device-puts
each batch sharded over the mesh's data axis.

All dataset classes expose the reference's loader API
``data_loaders(batch_size, split) -> (train, val, eval)``
(e.g. reference ``dsprites_dataset.py:55-98``) so the entry-point CLIs
look identical to the original.
"""

from __future__ import annotations

import os
from typing import Iterator, Sequence, Tuple

import numpy as np


def datasets_root() -> str:
    """The one place dataset-root resolution lives: the
    ``ARVAE_DATASETS_DIR`` env var, else ``datasets/`` next to the repo
    (mnist, dsprites, and the bar datasets all resolve through here so
    their caches cannot drift into different directories)."""
    return os.environ.get(
        "ARVAE_DATASETS_DIR",
        os.path.normpath(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            os.pardir,
            "datasets",
        )),
    )


class EpochLoader:
    """Deterministic batched iterator over a tuple of aligned arrays."""

    def __init__(
        self,
        arrays: Sequence[np.ndarray],
        batch_size: int,
        shuffle: bool,
        drop_last: bool = False,
        seed: int = 0,
    ):
        n = len(arrays[0])
        for a in arrays:
            assert len(a) == n, "misaligned arrays"
        self.arrays = tuple(arrays)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.RandomState(seed)
        self.n = n

    def __len__(self) -> int:
        if self.drop_last:
            return self.n // self.batch_size
        return (self.n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Tuple[np.ndarray, ...]]:
        idx = np.arange(self.n)
        if self.shuffle:
            self._rng.shuffle(idx)
        nb = len(self)
        for b in range(nb):
            sel = idx[b * self.batch_size : (b + 1) * self.batch_size]
            yield tuple(a[sel] for a in self.arrays)


class ArrayDataset:
    """A tuple of aligned numpy arrays with reference-style split loaders."""

    def __init__(self, *arrays: np.ndarray, seed: int = 0):
        self.arrays = tuple(np.asarray(a) for a in arrays)
        self.seed = seed

    def __len__(self) -> int:
        return len(self.arrays[0])

    def data_loaders(
        self,
        batch_size: int,
        split: Tuple[float, float] = (0.70, 0.20),
        drop_last: bool = False,
    ) -> Tuple[EpochLoader, EpochLoader, EpochLoader]:
        """(train, val, eval) loaders by contiguous fractional split.

        Mirrors the reference's sequential-slice split semantics
        (``dsprites_dataset.py:55-78``, ``bar_dataset.py:179-222``):
        train is shuffled per epoch, val/eval iterate in order.
        """
        assert sum(split) < 1
        n = len(self)
        a, b = split
        i0, i1 = int(a * n), int((a + b) * n)
        tr = tuple(x[:i0] for x in self.arrays)
        va = tuple(x[i0:i1] for x in self.arrays)
        ev = tuple(x[i1:] for x in self.arrays)
        return (
            EpochLoader(tr, batch_size, shuffle=True, drop_last=drop_last,
                        seed=self.seed),
            EpochLoader(va, batch_size, shuffle=False, drop_last=drop_last),
            EpochLoader(ev, batch_size, shuffle=False, drop_last=drop_last),
        )


class SplitArrayDataset:
    """Pre-split train/val arrays (MNIST-style: val reused as eval,
    reference ``mnist_dataset.py:24-41``)."""

    def __init__(self, train_arrays, val_arrays, seed: int = 0):
        self.train_arrays = tuple(np.asarray(a) for a in train_arrays)
        self.val_arrays = tuple(np.asarray(a) for a in val_arrays)
        self.seed = seed

    def data_loaders(self, batch_size: int, split=(0.70, 0.20), drop_last=False):
        # `split` accepted for API parity; the train/test split is fixed
        # by the files on disk, exactly like torchvision MNIST.
        del split
        return (
            EpochLoader(self.train_arrays, batch_size, shuffle=True,
                        drop_last=drop_last, seed=self.seed),
            EpochLoader(self.val_arrays, batch_size, shuffle=False),
            EpochLoader(self.val_arrays, batch_size, shuffle=False),
        )
