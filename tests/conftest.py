"""Test harness: run everything on a virtual 8-device CPU mesh.

The TPU-world stand-in for multi-node fake-backend testing (SURVEY.md
§4): force the host platform and split it into 8 XLA devices so every
sharding/collective path is exercised without TPU hardware. The axon
sitecustomize pins ``jax_platforms`` on import, so the override must go
through ``jax.config`` rather than the environment variable.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

MORPHO_COLS = ["digit_identity", "area", "length", "thickness", "slant",
               "width", "height"]


def write_reference_mnist_corpus(plain_dir, sizes=(("train", 64),
                                                   ("t10k", 32)), seed=0):
    """Writes a tiny MNIST corpus in the reference's on-disk format
    (IDX .gz images/labels + 7-column morphometrics CSV, reference
    ``data/dataloaders/mnist_dataset.py:60-82``) under ``plain_dir``.
    Shared by the ingestion and CLI-level tests so the format lives in
    one place."""
    import numpy as np
    import pandas as pd

    from arvae_tpu.data.morphomnist import io as idx_io

    os.makedirs(str(plain_dir), exist_ok=True)
    rng = np.random.RandomState(seed)
    for kind, n in sizes:
        imgs = (rng.rand(n, 28, 28) > 0.7).astype(np.uint8) * 255
        labels = rng.randint(0, 10, n).astype(np.uint8)
        idx_io.save_idx(imgs, os.path.join(
            str(plain_dir), f"{kind}-images-idx3-ubyte.gz"))
        idx_io.save_idx(labels, os.path.join(
            str(plain_dir), f"{kind}-labels-idx1-ubyte.gz"))
        morpho = np.concatenate(
            [labels[:, None].astype(np.float32),
             rng.rand(n, 6).astype(np.float32)], axis=1)
        pd.DataFrame(morpho, columns=MORPHO_COLS).to_csv(
            os.path.join(str(plain_dir), f"{kind}-morpho.csv"), index=False)
