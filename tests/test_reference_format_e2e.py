"""End-to-end reference-format ingestion smoke (round-3 item 7).

Writes a tiny corpus in the reference's on-disk formats — .abc tune
files for the folk pipeline (reference bar_dataset.py:865-930), IDX
gzip archives + a morpho CSV for MNIST (reference
mnist_dataset.py:60-82) — then builds the datasets through the REAL
artifact code paths (not the synthetic fallbacks) and drives one
jitted train step of the corresponding model family.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# -- folk: .abc corpus ------------------------------------------------------

NOTES = ["C", "D", "E", "F", "G", "A", "B", "c"]


def _abc_tune(idx: int, rng: np.random.RandomState) -> str:
    bars = []
    for _ in range(8):
        bars.append("".join(rng.choice(NOTES, 4)))
    body = "|".join(bars) + "|"
    return f"X:{idx}\nT:Smoke Tune {idx}\nM:4/4\nL:1/4\nK:C\n{body}\n"


@pytest.fixture()
def abc_corpus(tmp_path):
    raw = tmp_path / "folk_raw_data"
    raw.mkdir()
    rng = np.random.RandomState(0)
    for i in range(8):
        (raw / f"tune_{i}.abc").write_text(_abc_tune(i + 1, rng))
    return raw


def test_folk_abc_ingestion_to_train_step(abc_corpus, tmp_path, monkeypatch):
    monkeypatch.setenv("ARVAE_DATASETS_DIR", str(tmp_path / "ds"))
    from arvae_tpu.data.bar_dataset import FolkNBarDataset

    ds = FolkNBarDataset(dataset_type="train", is_short=True, num_bars=1,
                         raw_datapath=str(abc_corpus))
    score, metadata = ds.make_dataset()
    assert len(score) >= 8  # 8 tunes x transpositions x measures
    # the REAL pipeline ran: the reference-style validated-file cache
    # exists and lists all 8 tunes
    cache = os.path.join(ds.dataset_dir_path, "4by4valid_filelist.txt")
    with open(cache) as f:
        assert len([l for l in f if l.strip()]) == 8

    # one jitted train step on a batch drawn through the data loaders
    from arvae_tpu.data.attributes import MusicAttributes
    from arvae_tpu.models.measure_vae import MeasureVAE
    from arvae_tpu.ops.losses import (kld_loss, token_cross_entropy_loss,
                                      total_reg_loss)

    gen_train, _, _ = ds.data_loaders(batch_size=8)
    batch_score, _ = next(iter(gen_train))
    batch_score = jnp.asarray(np.asarray(batch_score), jnp.int32)
    assert batch_score.shape == (8, 24)

    attrs = MusicAttributes(ds.index2note_dicts)
    model = MeasureVAE(num_notes=len(ds.index2note_dicts),
                       encoder_hidden_size=32, decoder_hidden_size=32,
                       latent_space_dim=16)
    params = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1),
         "dropout": jax.random.key(2)},
        batch_score[:1], train=True,
    )["params"]

    def loss_fn(p):
        out = model.apply({"params": p}, batch_score, train=True,
                          rng_key=jax.random.key(3))
        loss = token_cross_entropy_loss(out.weights, batch_score)
        loss += kld_loss(out.z_mean, out.z_log_std, 0.001, 0.0)
        labels = attrs.compute_labels(batch_score)
        loss += total_reg_loss(out.z_tilde, labels, ((0, 0), (1, 1)),
                               1.0, 10.0)
        return loss

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss))
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), grads, 0.0
    )
    assert np.isfinite(gnorm) and gnorm > 0.0


def test_valid_file_cache_full_and_cap_applied_on_read(abc_corpus, tmp_path,
                                                       monkeypatch):
    """The validated-file cache always holds the FULL list; the
    max_num_files cap is applied by the reader, so a short run cannot
    poison later full runs (the reference caps while building,
    bar_dataset.py:871-873 — capability reproduced, bug not cloned)."""
    monkeypatch.setenv("ARVAE_DATASETS_DIR", str(tmp_path / "ds"))
    from arvae_tpu.data.bar_dataset import FolkBarDataset

    ds = FolkBarDataset(dataset_type="train", is_short=True,
                        raw_datapath=str(abc_corpus))
    ds.max_num_files = 4
    ds._all_tunes_cache = None
    assert len(ds._corpus_all_tunes()) <= 4
    cache = os.path.join(ds.dataset_dir_path, "4by4valid_filelist.txt")
    with open(cache) as f:
        assert len([l for l in f if l.strip()]) == 8

    # a fresh full-mode dataset re-reads the same cache uncapped
    ds_full = FolkBarDataset(dataset_type="train", is_short=False,
                             raw_datapath=str(abc_corpus))
    assert len(ds_full._corpus_all_tunes()) == 8


# -- mnist: IDX gz + morpho csv ---------------------------------------------


def test_mnist_idx_csv_ingestion_to_train_step(tmp_path):
    from conftest import write_reference_mnist_corpus

    root = tmp_path / "mnist"
    write_reference_mnist_corpus(root / "plain")

    from arvae_tpu.data.mnist import MorphoMnistDataset

    ds = MorphoMnistDataset(root=str(root))
    gen_train, _, _ = ds.data_loaders(batch_size=8)
    images, digits, morpho = next(iter(gen_train))
    images = jnp.asarray(np.asarray(images), jnp.float32)
    assert images.shape == (8, 1, 28, 28)
    assert np.asarray(morpho).shape == (8, 7)

    from arvae_tpu.models import MnistVAE
    from arvae_tpu.ops.losses import (kld_loss, reconstruction_loss,
                                      total_reg_loss)

    model = MnistVAE()
    params = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1),
         "sample": jax.random.key(2)},
        images[:1], train=True,
    )["params"]
    labels = jnp.asarray(np.asarray(morpho), jnp.float32)

    def loss_fn(p):
        out = model.apply(
            {"params": p}, images, train=True,
            rngs={"dropout": jax.random.key(3),
                  "sample": jax.random.key(4)},
        )
        loss = reconstruction_loss(out.logits, images, "bernoulli")
        loss += kld_loss(out.z_mean, out.z_log_std, beta=1.0, c=0.0)
        loss += total_reg_loss(out.z_tilde, labels, ((1, 0), (2, 1)),
                               gamma=10.0, delta=1.0, use_pallas=False)
        return loss

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss))
