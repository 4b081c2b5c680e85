"""MeasureVAE model + bar dataset + trainer tests (tiny configs, CPU mesh)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arvae_tpu.data.bar_dataset import (
    ChoraleNBarDataset,
    FolkNBarDataset,
    Score,
)
from arvae_tpu.data.music_theory import START_SYMBOL
from arvae_tpu.models.measure_vae import MeasureVAE


@pytest.fixture(scope="module")
def folk(tmp_path_factory):
    os.environ["ARVAE_DATASETS_DIR"] = str(tmp_path_factory.mktemp("music"))
    return FolkNBarDataset(dataset_type="train", is_short=True, num_bars=1)


class TestBarDataset:
    def test_vocab_persistence_roundtrip(self, folk):
        ds2 = FolkNBarDataset(dataset_type="train", is_short=True, num_bars=1)
        assert ds2.note2index_dicts == folk.note2index_dicts
        assert ds2.index2note_dicts == folk.index2note_dicts

    def test_dataset_shapes(self, folk):
        score, meta = folk.get_dataset()
        assert score.shape[1] == 24
        assert score.shape == meta.shape
        assert score.max() < len(folk.note2index_dicts)

    def test_first_window_is_start_padded(self, folk):
        # first window of every transposition covers ticks [-24, 0)
        score, _ = folk.get_dataset()
        start_idx = folk.note2index_dicts[START_SYMBOL]
        assert (score[0] == start_idx).all()

    def test_score_tensor_roundtrip(self, folk):
        score_arr, _ = folk.get_dataset()
        row = score_arr[5:6]
        s = folk.tensor_to_m21score(row)
        t2 = folk.score_to_tensor(s)
        if t2 is not None and t2.shape[1] >= 24:
            np.testing.assert_array_equal(t2[0, :24], row[0])

    def test_nbars_window_length(self):
        ds = FolkNBarDataset(dataset_type="train", is_short=True, num_bars=2)
        score, _ = ds.get_dataset()
        assert score.shape[1] == 48

    def test_chorale_variant(self):
        ds = ChoraleNBarDataset(dataset_type="train", is_short=True, num_bars=1)
        score, _ = ds.get_dataset()
        assert score.shape[1] == 24
        assert ds.class_name.startswith("4by4_ChoraleNBarDataset_1_")

    def test_concatenate_scores(self, folk):
        s1 = Score(notes=[(60, 0.0, 1.0)])
        s2 = Score(notes=[(62, 0.0, 2.0)])
        c = folk.concatenate_scores([s1, s2])
        assert c.notes == [(60, 0.0, 1.0), (62, 4.0, 2.0)]


class TestMeasureVAEModel:
    def _tiny(self, V):
        return MeasureVAE(
            num_notes=V, encoder_hidden_size=32, decoder_hidden_size=32,
            latent_space_dim=16,
        )

    def test_forward_shapes(self):
        V = 30
        m = self._tiny(V)
        score = jnp.zeros((2, 24), jnp.int32)
        vs = m.init({"params": jax.random.key(0), "sample": jax.random.key(1),
                     "dropout": jax.random.key(2)}, score, train=True)
        out = m.apply(vs, score, train=True,
                      rngs={"sample": jax.random.key(3),
                            "dropout": jax.random.key(4)})
        assert out.weights.shape == (2, 24, V)
        assert out.samples.shape == (2, 24)
        assert out.z_tilde.shape == (2, 16)

    def test_samples_in_vocab_range(self):
        V = 30
        m = self._tiny(V)
        score = jnp.zeros((2, 24), jnp.int32)
        vs = m.init({"params": jax.random.key(0), "sample": jax.random.key(1),
                     "dropout": jax.random.key(2)}, score, train=True)
        out = m.apply(vs, score, train=False, rngs={"sample": jax.random.key(0)})
        s = np.asarray(out.samples)
        assert s.min() >= 0 and s.max() < V

    def test_eval_forward_deterministic(self):
        V = 30
        m = self._tiny(V)
        score = jnp.zeros((2, 24), jnp.int32)
        vs = m.init({"params": jax.random.key(0), "sample": jax.random.key(1),
                     "dropout": jax.random.key(2)}, score, train=True)
        o1 = m.apply(vs, score, train=False, rngs={"sample": jax.random.key(7)})
        o2 = m.apply(vs, score, train=False, rngs={"sample": jax.random.key(7)})
        np.testing.assert_array_equal(np.asarray(o1.weights),
                                      np.asarray(o2.weights))

    def test_oov_token_clamps_instead_of_nan(self):
        # an out-of-range token id must clamp to the last embedding row
        # (mode="clip"), matching the fused kernel's one-hot clamp —
        # jit's take default is "fill", which NaN-poisons the whole
        # forward (review r4)
        V = 30
        m = self._tiny(V)
        score = jnp.zeros((2, 24), jnp.int32)
        vs = m.init({"params": jax.random.key(0), "sample": jax.random.key(1),
                     "dropout": jax.random.key(2)}, score, train=True)
        bad = score.at[0, 3].set(V + 7)  # corrupt teacher token
        fwd = jax.jit(
            lambda s: m.apply(vs, s, train=True,
                              rngs={"sample": jax.random.key(3),
                                    "dropout": jax.random.key(4)})
        )
        out = fwd(bad)
        assert np.isfinite(np.asarray(out.weights)).all()
        clamped = fwd(score.at[0, 3].set(V - 1))
        np.testing.assert_array_equal(np.asarray(out.weights),
                                      np.asarray(clamped.weights))

    def test_logits_nonnegative_relu_head(self):
        # the reference puts a ReLU on the output head (decoder.py:365-368)
        V = 30
        m = self._tiny(V)
        score = jnp.zeros((2, 24), jnp.int32)
        vs = m.init({"params": jax.random.key(0), "sample": jax.random.key(1),
                     "dropout": jax.random.key(2)}, score, train=True)
        out = m.apply(vs, score, train=False, rngs={"sample": jax.random.key(0)})
        assert float(out.weights.min()) >= 0.0


class TestMeasureTrainer:
    def test_one_epoch_and_metrics(self, folk, tmp_path, monkeypatch):
        monkeypatch.setenv("ARVAE_MODELS_DIR", str(tmp_path / "models"))
        from arvae_tpu.training.measure_trainer import MeasureVAETrainer

        model = MeasureVAE(
            num_notes=len(folk.note2index_dicts),
            encoder_hidden_size=32, decoder_hidden_size=32,
            latent_space_dim=16,
        )
        tr = MeasureVAETrainer(
            folk, model, reg_type=("all",), reg_dim=(0, 1, 2, 3),
            beta=0.001, gamma=1.0, delta=10.0, rand=0, use_pallas=False,
        )
        assert tr.model_repr() == (
            "folk_MeasureVAE_r_0_b_0.001_g_1.0_d_10.0_all_"
        )
        tr.train_model(batch_size=64, num_epochs=1, log=False)
        m = tr.compute_eval_metrics(batch_size=64)
        assert "interpretability" in m and "mig" in m
        # decode path
        score, samples = tr.decode_latent_codes(np.zeros((1, 16), np.float32))
        assert samples.shape == (1, 24)


class TestMeasureLengthGuard:
    def test_non_44_corpus_rejected(self, folk, tmp_path, monkeypatch):
        """A 3/4 corpus reshapes cleanly into 24-tick windows that
        straddle bar lines — the trainer must reject it loudly."""
        monkeypatch.setenv("ARVAE_MODELS_DIR", str(tmp_path / "models"))
        from arvae_tpu.training.measure_trainer import MeasureVAETrainer

        ds34 = FolkNBarDataset(dataset_type="train", is_short=True,
                               num_bars=1, time_sig_num=3)
        model = MeasureVAE(
            num_notes=64, encoder_hidden_size=32,
            decoder_hidden_size=32, latent_space_dim=16,
        )
        with pytest.raises(ValueError, match="18 ticks"):
            MeasureVAETrainer(ds34, model, reg_type=(), reg_dim=())
