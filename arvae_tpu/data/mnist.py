"""MNIST / Morpho-MNIST datasets (reference ``mnist_dataset.py:10-82``).

``MorphoMnistDataset`` yields batches of
``(image (B,1,28,28) float32∈[0,1], digit_label (B,), morpho (B,6))``
with the six morphometrics (area, length, thickness, slant, width,
height) exactly as the reference.

Data resolution order:
1. Real IDX archives + ``*-morpho.csv`` at ``<root>/plain/`` (the
   reference's layout, ``mnist_dataset.py:48-76``), when present.
2. Otherwise a deterministic synthetic digit set
   (:mod:`arvae_tpu.data.synthetic_digits`) whose morphometrics are
   *measured* — not faked — with :mod:`arvae_tpu.data.morphomnist`, and
   cached to disk in the same IDX + CSV formats so the two paths share
   one loader.
"""

from __future__ import annotations

import multiprocessing
import os
from typing import Optional, Tuple

import numpy as np
import pandas as pd

from arvae_tpu.data.loaders import SplitArrayDataset, datasets_root
from arvae_tpu.data.morphomnist import io as idx_io
from arvae_tpu.data.morphomnist.measure import measure_batch
from arvae_tpu.data.synthetic_digits import generate_digit_set

# Synthetic set sizes (one-time generation incl. morphometrics is
# ~minutes with a process pool; cached afterwards).
SYNTH_TRAIN = 8192
SYNTH_TEST = 2048


def _default_root() -> str:
    return os.path.join(datasets_root(), "mnist_data")


def _measure_images(imgs_u8: np.ndarray) -> np.ndarray:
    with multiprocessing.Pool() as pool:
        df = measure_batch(imgs_u8, pool=pool, chunksize=64)
    return df.values.astype(np.float32)


class MnistDataset(SplitArrayDataset):
    """Plain MNIST: (image, digit) batches (reference mnist_dataset.py:10-41)."""

    def __init__(self, root: Optional[str] = None, seed: int = 0):
        root = os.path.abspath(root or _default_root())
        self.root_dir = os.path.join(root, "plain")
        tr = self._load_or_generate("train")
        te = self._load_or_generate("t10k")
        super().__init__(tr, te, seed=seed)
        self._arrays = {"train": tr, "t10k": te}
        self._morpho = {}

    # Morphometrics are measured LAZILY: the plain-MNIST loaders yield
    # (image, digit) only, and measuring the whole set costs minutes of
    # process-pool time on a cold cache — pay it on first morpho access
    # (MorphoMnistDataset's constructor, not test_mnist.py's).
    def _full(self, kind: str):
        if kind not in self._morpho:
            images, labels = self._arrays[kind]
            self._morpho[kind] = self._load_or_measure_morpho(
                kind, images, labels)
        images, labels = self._arrays[kind]
        return images, labels, self._morpho[kind]

    @property
    def _full_train(self):
        return self._full("train")

    @property
    def _full_test(self):
        return self._full("t10k")

    # -- loading ------------------------------------------------------------

    def _paths(self, kind: str) -> Tuple[str, str, str]:
        return (
            os.path.join(self.root_dir, f"{kind}-images-idx3-ubyte.gz"),
            os.path.join(self.root_dir, f"{kind}-labels-idx1-ubyte.gz"),
            os.path.join(self.root_dir, f"{kind}-morpho.csv"),
        )

    def _load_or_generate(self, kind: str):
        img_p, lab_p, mor_p = self._paths(kind)
        have_img, have_lab = os.path.exists(img_p), os.path.exists(lab_p)
        if have_img != have_lab:
            # never silently overwrite the surviving half of a real
            # corpus with synthetic data
            missing = lab_p if have_img else img_p
            raise FileNotFoundError(
                f"incomplete MNIST archive for {kind!r}: {missing} is "
                "missing — restore it, or remove the other archive to "
                "regenerate the synthetic set"
            )
        if not have_img:
            self._generate_synthetic(kind)
            if os.path.exists(mor_p):
                # measured from whatever images existed before; stale
                os.remove(mor_p)
        images = idx_io.load_idx(img_p)
        images = np.expand_dims(images, 1).astype(np.float32) / 255.0
        labels = idx_io.load_idx(lab_p).astype(np.int64)
        return images, labels

    def _load_or_measure_morpho(self, kind: str, images, labels):
        _, _, mor_p = self._paths(kind)
        df = None
        if os.path.exists(mor_p):
            # a cached CSV measured from a different image set (e.g. the
            # synthetic pair replaced by real archives) must not load as
            # misaligned labels; parse ONCE and reuse
            df = pd.read_csv(mor_p)
            if len(df) != len(images):
                print(f"morphometrics cache {mor_p} does not match the "
                      f"{len(images)}-image archive; re-measuring")
                os.remove(mor_p)
                df = None
        if df is None:
            print(f"measuring morphometrics for {kind} "
                  f"({len(images)} images)...")
            measured = _measure_images((images[:, 0] * 255).astype(np.uint8))
            df = pd.DataFrame(
                np.concatenate(
                    [labels[:, None].astype(np.float32), measured], 1),
                columns=["digit_identity", "area", "length", "thickness",
                         "slant", "width", "height"],
            )
            df.to_csv(mor_p, index=False)
        morpho = df.values.astype(np.float32)
        # MNIST_REG_TYPES indexes morpho columns 1..6 with column 0 a
        # digit/index placeholder (the reference's Morpho-MNIST CSVs lead
        # with an index column). Normalize older 6-column caches.
        if morpho.shape[1] == 6:
            morpho = np.concatenate(
                [labels[:, None].astype(np.float32), morpho], 1
            )
        return morpho

    def _generate_synthetic(self, kind: str):
        os.makedirs(self.root_dir, exist_ok=True)
        n = SYNTH_TRAIN if kind == "train" else SYNTH_TEST
        seed = 0 if kind == "train" else 1
        print(f"generating synthetic digit set '{kind}' (n={n})...")
        imgs, labels = generate_digit_set(n, seed=seed)
        img_p, lab_p, _ = self._paths(kind)
        idx_io.save_idx((imgs[:, 0] * 255).astype(np.uint8), img_p)
        idx_io.save_idx(labels.astype(np.uint8), lab_p)


class MorphoMnistDataset(MnistDataset):
    """MNIST + per-image morphometrics (reference mnist_dataset.py:44-82)."""

    def __init__(self, root: Optional[str] = None, seed: int = 0):
        super().__init__(root=root, seed=seed)
        # batches: (image, digit_label, morpho_labels[7])
        self.train_arrays = self._full_train
        self.val_arrays = self._full_test

    def _mk_device_split(self, ctx, arrays):
        from arvae_tpu.data.device_data import DeviceSplit

        images, _, morpho = arrays
        rows = (np.asarray(images)[:, 0] * 255).astype(np.uint8)
        rows = rows.reshape(len(rows), -1)
        return DeviceSplit(
            rows, np.asarray(morpho, np.float32), (1, 28, 28), "bytes", ctx,
        )

    def device_splits(self, ctx, split=(0.70, 0.20)):
        """Device-resident (train, val) splits: uint8 pixel rows +
        morpho labels on device (see arvae_tpu.data.device_data).
        The fixed file-based train/test split stands in for `split`,
        mirroring data_loaders."""
        del split
        return (self._mk_device_split(ctx, self._full_train),
                self._mk_device_split(ctx, self._full_test))

    def device_eval_split(self, ctx, split=None):
        """Eval split == the test files ONLY (mirrors data_loaders) —
        eval-only invocations must not pay the train split's
        host→device upload on this tunneled transport."""
        del split
        return self._mk_device_split(ctx, self._full_test)
