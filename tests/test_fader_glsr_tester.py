"""Fader trainer, GLSR trainer, and VAETester smoke/behavior tests."""

import os

import jax
import numpy as np
import pytest

from arvae_tpu.data.bar_dataset import FolkNBarDataset
from arvae_tpu.data.dsprites import DspritesDataset
from arvae_tpu.models import DspritesFaderNetwork
from arvae_tpu.models.measure_vae import MeasureVAE

SMALL_FACTORS = (1, 3, 2, 4, 4, 4)


@pytest.fixture(scope="module")
def dsprites(tmp_path_factory):
    root = tmp_path_factory.mktemp("dsp")
    return DspritesDataset(root=str(root), factor_sizes=SMALL_FACTORS)


@pytest.fixture(scope="module")
def folk(tmp_path_factory):
    os.environ["ARVAE_DATASETS_DIR"] = str(tmp_path_factory.mktemp("music2"))
    return FolkNBarDataset(dataset_type="train", is_short=True, num_bars=1)


class TestFaderTrainer:
    def test_train_and_metrics(self, dsprites, tmp_path, monkeypatch):
        monkeypatch.setenv("ARVAE_MODELS_DIR", str(tmp_path / "models"))
        from arvae_tpu.training.fader_trainer import ImageFaderTrainer

        tr = ImageFaderTrainer(dsprites, DspritesFaderNetwork(), beta=1.0,
                               rand=0)
        assert tr.model_repr() == "DspritesFader_r_0_b_1.0_"
        tr.train_model(batch_size=32, num_epochs=1, log=False)
        m = tr.compute_eval_metrics(batch_size=32)
        assert "interpretability" in m and "mig" in m
        # 5 normalized attributes (color dropped)
        lat, attrs, attr_list = tr.compute_representations(
            dsprites.data_loaders(32)[2], num_batches=2
        )
        assert attrs.shape[1] == 5
        assert attrs.min() >= -1e-6 and attrs.max() <= 1.0 + 1e-6

    def test_disc_learns_on_detached_z(self, dsprites, tmp_path, monkeypatch):
        monkeypatch.setenv("ARVAE_MODELS_DIR", str(tmp_path / "models"))
        from arvae_tpu.training.fader_trainer import ImageFaderTrainer
        from arvae_tpu.parallel import shard_batch

        tr = ImageFaderTrainer(dsprites, DspritesFaderNetwork(), beta=1.0,
                               rand=0)
        tr.ensure_state()
        step = tr.make_train_step()
        loader = dsprites.data_loaders(32)[0]
        batch = tr.process_batch(next(iter(loader)))
        batch = shard_batch(tr.mesh, batch)
        disc_losses, rec_losses = [], []
        state = tr.state
        for i in range(30):
            state, metrics = step(state, batch, jax.random.key(i))
            disc_losses.append(float(metrics["disc_loss"]))
            rec_losses.append(float(metrics["recons_loss"]))
        # the fader reconstructs better, and the adversarial game stays
        # finite (disc chases a moving z, so strict monotonicity is not
        # guaranteed over a short horizon)
        assert np.mean(rec_losses[-5:]) < np.mean(rec_losses[:5])
        assert np.mean(disc_losses[-5:]) < 2.0 * np.mean(disc_losses[:5])
        assert all(np.isfinite(disc_losses))


class TestGLSRTrainer:
    def test_loss_and_step(self, folk, tmp_path, monkeypatch):
        monkeypatch.setenv("ARVAE_MODELS_DIR", str(tmp_path / "models"))
        from arvae_tpu.parallel import shard_batch
        from arvae_tpu.training.glsr_trainer import MeasureVAETrainerGLSR

        model = MeasureVAE(
            num_notes=len(folk.note2index_dicts),
            encoder_hidden_size=32, decoder_hidden_size=32,
            latent_space_dim=16,
        )
        tr = MeasureVAETrainerGLSR(folk, model, reg_type="rhy_complexity",
                                   reg_dim=0, rand=0)
        assert tr.model_repr().endswith("GLSR")
        tr.ensure_state()
        step = tr.make_train_step()
        loader = folk.data_loaders(32)[0]
        batch = tr.process_batch(next(iter(loader)))
        batch = shard_batch(tr.mesh, batch)
        state, metrics = step(tr.state, batch, jax.random.key(0))
        assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["reg_loss"]) > 0  # N(100,1) prior is far away

    def test_grad_attr_surrogates(self, folk):
        import jax.numpy as jnp

        from arvae_tpu.training.glsr_trainer import MeasureVAETrainerGLSR

        model = MeasureVAE(num_notes=len(folk.note2index_dicts),
                           encoder_hidden_size=32, decoder_hidden_size=32,
                           latent_space_dim=16)
        tr = MeasureVAETrainerGLSR(folk, model, reg_type="num_notes",
                                   reg_dim=0, rand=0)
        V = len(folk.note2index_dicts)
        # all mass on a note token everywhere -> num_notes == 1
        sw = jnp.zeros((2, 24, V)).at[:, :, 5].set(1.0)
        is_note = bool(np.asarray(tr.attrs.is_note_table)[5])
        got = np.asarray(tr.compute_grad_attr(sw))
        np.testing.assert_allclose(got, [1.0 * is_note] * 2, atol=1e-6)


class TestVAETester:
    @pytest.fixture()
    def tester(self, folk, tmp_path, monkeypatch):
        monkeypatch.setenv("ARVAE_MODELS_DIR", str(tmp_path / "models"))
        from arvae_tpu.eval.tester import VAETester
        from arvae_tpu.training.measure_trainer import MeasureVAETrainer

        model = MeasureVAE(num_notes=len(folk.note2index_dicts),
                           encoder_hidden_size=32, decoder_hidden_size=32,
                           latent_space_dim=16)
        tr = MeasureVAETrainer(folk, model, reg_type=(), reg_dim=(), rand=0)
        tr.ensure_state()
        return VAETester(tr, plots_dir=str(tmp_path / "plots"))

    def test_interpretability_probe(self, tester):
        dim, score = tester.test_interpretability(32, "rhy_complexity")
        assert 0 <= dim < 16
        assert np.isfinite(score)

    def test_decode_mid_point_shape(self, tester):
        z1 = np.zeros((1, 16), np.float32)
        z2 = np.ones((1, 16), np.float32)
        t = tester.decode_mid_point(z1, z2, 3)
        assert t.shape == (1, (3 + 2) * 24)

    def test_interpolation_midi_artifact(self, tester):
        tester.test_attr_reg_interpolations(num_points=1, dim=0,
                                            num_interps=2)
        files = os.listdir(tester.plots_dir)
        assert any(f.endswith(".mid") for f in files)

    def test_pca_plot(self, tester):
        tester.plot_attribute_dist(attribute="num_notes", plt_type="pca")
        assert os.path.exists(
            os.path.join(tester.plots_dir, "pca_num_notes_measure_vae.png")
        )


class TestVAETesterGLSR:
    def test_wires_glsr_run_and_analyzes(self, folk, tmp_path, monkeypatch):
        """Train a GLSR model for one epoch, then instantiate the GLSR
        tester: it must resolve the 'GLSR'-suffixed run dir, restore
        that checkpoint, and run an analysis method."""
        monkeypatch.setenv("ARVAE_MODELS_DIR", str(tmp_path / "models"))
        from arvae_tpu.eval.tester import VAETesterGLSR
        from arvae_tpu.training.glsr_trainer import MeasureVAETrainerGLSR

        model = MeasureVAE(num_notes=len(folk.note2index_dicts),
                           encoder_hidden_size=32, decoder_hidden_size=32,
                           latent_space_dim=16)
        tr = MeasureVAETrainerGLSR(folk, model, reg_type="rhy_complexity",
                                   reg_dim=0, rand=0)
        tr.train_model(batch_size=32, num_epochs=1, log=False)
        trained = jax.device_get(tr.state.params)

        tester = VAETesterGLSR(folk, model, reg_type="rhy_complexity",
                               reg_dim=0, rand=0,
                               plots_dir=str(tmp_path / "plots"))
        assert tester.trainer.model_repr().endswith("GLSR")
        # restored the trained checkpoint, not a fresh init
        restored = jax.device_get(tester.trainer.state.params)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            restored, trained,
        )
        dim, score = tester.test_interpretability(32, "rhy_complexity")
        assert 0 <= dim < 16 and np.isfinite(score)

    def test_gamma_selects_run_dir(self, folk, tmp_path, monkeypatch):
        """gamma is part of the trainer_config string, so the tester's
        gamma kwarg must select the matching run dir (the blessed
        non-degenerate GLSR run trains at gamma=1e-3, not the
        reference's 1.0)."""
        monkeypatch.setenv("ARVAE_MODELS_DIR", str(tmp_path / "models"))
        from arvae_tpu.eval.tester import VAETesterGLSR

        model = MeasureVAE(num_notes=len(folk.note2index_dicts),
                           encoder_hidden_size=32, decoder_hidden_size=32,
                           latent_space_dim=16)
        tester = VAETesterGLSR(folk, model, reg_type="rhy_complexity",
                               reg_dim=0, gamma=1e-3, rand=0,
                               plots_dir=str(tmp_path / "plots"),
                               load=False)
        assert "_g_0.001_" in tester.trainer.model_repr()
        assert tester.trainer.model_repr().endswith("GLSR")
