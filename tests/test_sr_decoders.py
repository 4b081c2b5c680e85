"""SRDecoder / SRDecoderNoInput variants (reference decoder.py:53-306)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arvae_tpu.models.measure_vae import (
    MeasureVAE,
    SRDecoder,
    SRDecoderNoInput,
)

V = 30


def _rngs(i=0):
    return {"sample": jax.random.key(10 + i), "dropout": jax.random.key(20 + i)}


def _decoder(cls, **kw):
    dec = cls(num_notes=V, rnn_hidden_size=32, z_dim=16, **kw)
    z = jnp.ones((2, 16), jnp.float32) * 0.1
    score = jnp.arange(48, dtype=jnp.int32).reshape(2, 24) % V
    vs = dec.init({"params": jax.random.key(0), **_rngs()}, z, score,
                  train=True)
    return dec, vs, z, score


class TestSRDecoder:
    def test_shapes_and_range(self):
        dec, vs, z, score = _decoder(SRDecoder)
        w, s = dec.apply(vs, z, score, train=False, rngs=_rngs())
        assert w.shape == (2, 24, V)
        assert s.shape == (2, 24)
        assert s.min() >= 0 and s.max() < V
        assert float(w.min()) >= 0.0  # ReLU output head

    def test_teacher_forcing_feeds_score(self):
        dec, vs, z, score = _decoder(SRDecoder, teacher_forcing_prob=1.0,
                                     dropout=0.0)
        other = (score + 7) % V
        w1, _ = dec.apply(vs, z, score, train=True, rngs=_rngs(1))
        w2, _ = dec.apply(vs, z, other, train=True, rngs=_rngs(1))
        # step 0 consumes x_0 for both; later steps consume the teacher
        np.testing.assert_allclose(w1[:, 0], w2[:, 0], atol=1e-6)
        assert not np.allclose(w1[:, 1:], w2[:, 1:])

    def test_free_running_ignores_score(self):
        dec, vs, z, score = _decoder(SRDecoder, teacher_forcing_prob=0.0,
                                     dropout=0.0)
        other = (score + 7) % V
        w1, _ = dec.apply(vs, z, score, train=True, rngs=_rngs(1))
        w2, _ = dec.apply(vs, z, other, train=True, rngs=_rngs(1))
        np.testing.assert_allclose(w1, w2, atol=1e-6)

    def test_grad_flows(self):
        dec, vs, z, score = _decoder(SRDecoder, dropout=0.0)

        def loss(params, z):
            w, _ = dec.apply({"params": params}, z, score, train=True,
                             rngs=_rngs())
            return jnp.mean(w**2)

        g = jax.grad(loss)(vs["params"], z)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(x).all() for x in leaves)
        assert any(float(jnp.abs(x).max()) > 0 for x in leaves)


class TestSRDecoderNoInput:
    def test_shapes_and_range(self):
        dec, vs, z, score = _decoder(SRDecoderNoInput)
        w, s = dec.apply(vs, z, score, train=False, rngs=_rngs())
        assert w.shape == (2, 24, V)
        assert s.shape == (2, 24)
        assert s.min() >= 0 and s.max() < V
        assert float(w.min()) >= 0.0

    def test_non_autoregressive_ignores_score(self):
        dec, vs, z, score = _decoder(SRDecoderNoInput, dropout=0.0)
        other = (score + 3) % V
        w1, _ = dec.apply(vs, z, score, train=True, rngs=_rngs(2))
        w2, _ = dec.apply(vs, z, other, train=True, rngs=_rngs(2))
        np.testing.assert_allclose(w1, w2, atol=1e-6)

    def test_depends_on_z(self):
        dec, vs, z, score = _decoder(SRDecoderNoInput, dropout=0.0)
        w1, _ = dec.apply(vs, z, score, train=False, rngs=_rngs())
        w2, _ = dec.apply(vs, z + 1.0, score, train=False, rngs=_rngs())
        assert not np.allclose(w1, w2)


class TestMeasureVAEDecoderKnob:
    @pytest.mark.parametrize("decoder_type", ["sr", "sr-no-input"])
    def test_full_vae_forward(self, decoder_type):
        m = MeasureVAE(
            num_notes=V, encoder_hidden_size=32, decoder_hidden_size=32,
            latent_space_dim=16, decoder_type=decoder_type,
        )
        score = jnp.zeros((2, 24), jnp.int32)
        vs = m.init({"params": jax.random.key(0), **_rngs()}, score,
                    train=True)
        out = jax.jit(
            lambda v, s: m.apply(v, s, train=True, rngs=_rngs(3))
        )(vs, score)
        assert out.weights.shape == (2, 24, V)
        assert out.samples.shape == (2, 24)

    def test_unknown_decoder_type_raises(self):
        m = MeasureVAE(num_notes=V, decoder_type="nope")
        with pytest.raises(ValueError, match="unknown decoder_type"):
            m.init({"params": jax.random.key(0), **_rngs()},
                   jnp.zeros((1, 24), jnp.int32), train=True)

    def test_trainer_repr_tags_variant(self, tmp_path, monkeypatch):
        monkeypatch.setenv("ARVAE_MODELS_DIR", str(tmp_path))
        monkeypatch.setenv("ARVAE_DATASETS_DIR", str(tmp_path / "ds"))
        from arvae_tpu.data.bar_dataset import FolkNBarDataset
        from arvae_tpu.training.measure_trainer import MeasureVAETrainer

        ds = FolkNBarDataset(dataset_type="train", is_short=True, num_bars=1)
        model = MeasureVAE(
            num_notes=len(ds.note2index_dicts), encoder_hidden_size=32,
            decoder_hidden_size=32, latent_space_dim=16, decoder_type="sr",
        )
        tr = MeasureVAETrainer(ds, model, reg_type=("all",),
                               reg_dim=(0, 1, 2, 3), rand=0)
        assert "_SRDecoder_" in tr.model_repr()
        # one tiny epoch end-to-end with the variant decoder
        tr.train_model(batch_size=64, num_epochs=1, log=False)


class TestSamplingValidation:
    """Every decoder variant must reject unknown sampling modes at init
    (a typo must not silently train with argmax)."""

    @pytest.mark.parametrize("cls", [SRDecoder, SRDecoderNoInput])
    def test_bad_sampling_raises(self, cls):
        with pytest.raises(NotImplementedError, match="sampling"):
            _decoder(cls, sampling="multinomail")

    def test_hierarchical_bad_sampling_raises(self):
        model = MeasureVAE(
            num_notes=V, note_embedding_dim=4, num_encoder_layers=1,
            encoder_hidden_size=8, latent_space_dim=4,
            num_decoder_layers=1, decoder_hidden_size=8,
            sampling="multinomail",
        )
        score = jnp.zeros((2, 24), jnp.int32)
        with pytest.raises(NotImplementedError, match="sampling"):
            model.init({"params": jax.random.key(0), **_rngs()}, score)
