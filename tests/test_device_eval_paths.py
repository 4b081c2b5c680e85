"""The eval surfaces must ride the device-resident splits when they
exist: on this TPU's tunneled transport a host-loader batch costs
~100-200 ms in device_put alone, so any per-batch host path in eval is
a regression (VERDICT r3 item 2). These tests poison the host loaders
and assert eval still completes.
"""

import os

import numpy as np
import pytest

from arvae_tpu.data.dsprites import DspritesDataset
from arvae_tpu.models import DspritesVAE
from arvae_tpu.training.image_trainer import (
    DSPRITES_REG_TYPE,
    ImageVAETrainer,
    get_reg_dim,
)

SMALL_FACTORS = (1, 3, 2, 4, 4, 4)


class _PoisonLoader:
    """A data loader whose iteration is a test failure."""

    def __iter__(self):
        raise AssertionError("host loader iterated on the device path")

    def __len__(self):
        return 1


class _StubWriter:
    def __init__(self):
        self.scalars = {}
        self.images = {}

    def add_scalar(self, tag, value, step):
        self.scalars[tag] = value

    def add_image(self, tag, img, step):
        self.images[tag] = np.asarray(img).shape


@pytest.fixture(scope="module")
def dsprites(tmp_path_factory):
    root = tmp_path_factory.mktemp("dsp_deveval")
    return DspritesDataset(root=str(root), factor_sizes=SMALL_FACTORS)


@pytest.fixture()
def models_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("ARVAE_MODELS_DIR", str(tmp_path / "models"))
    return tmp_path / "models"


def make_trainer(dsprites, **kw):
    defaults = dict(
        reg_type=("all",),
        reg_dim=get_reg_dim(DSPRITES_REG_TYPE),
        beta=1.0,
        gamma=10.0,
        delta=1.0,
        rand=0,
        use_pallas=False,
    )
    defaults.update(kw)
    return ImageVAETrainer(dsprites, DspritesVAE(), **defaults)


class TestImageEvalModelDevicePath:
    def test_no_runner_means_no_device_val_split(self, dsprites, models_dir):
        tr = make_trainer(dsprites)
        assert tr._device_val_split() is None

    def test_eval_model_rides_device_val_split(self, dsprites, models_dir):
        tr = make_trainer(dsprites)
        tr.train_model(batch_size=32, num_epochs=1, log=False)
        assert tr._device_runner is not None
        assert tr._device_val_split() is tr._device_runner.val_split

        tr.writer = _StubWriter()
        result = tr.eval_model(_PoisonLoader(), epoch_num=0)
        assert "interpretability" in result
        assert any(
            t.startswith("interpretability_metric/") for t in tr.writer.scalars
        )
        assert "reconstruction" in tr.writer.images
        # the 16-row recon grid is cached device-side
        assert hasattr(tr, "_val_grid_inputs")

    def test_eval_model_host_fallback_still_works(self, dsprites, models_dir,
                                                  monkeypatch):
        monkeypatch.setenv("ARVAE_HOST_LOADER", "1")
        tr = make_trainer(dsprites)
        tr.ensure_state()
        tr.writer = _StubWriter()
        _, gen_val, _ = dsprites.data_loaders(32, split=(0.7, 0.2))
        result = tr.eval_model(gen_val, epoch_num=0)
        assert "interpretability" in result


class TestLoggedTrainingZeroHostBatches:
    def test_log_run_never_iterates_host_loaders(self, dsprites, models_dir,
                                                 monkeypatch, tmp_path):
        """The VERDICT r3 item-2 'Done' criterion end-to-end: a --log
        training run performs zero steady-state per-batch host
        transfers. Every loader the dataset hands out is poisoned; the
        epoch + eval + tensorboard pipeline must run entirely from the
        device-resident splits."""
        monkeypatch.chdir(tmp_path)  # tensorboard 'runs/' goes to tmp
        tr = make_trainer(dsprites)

        real_loaders = dsprites.data_loaders

        def poisoned_loaders(*a, **k):
            gen_train, gen_val, gen_test = real_loaders(*a, **k)

            class Poison:
                def __init__(self, n):
                    self._n = n

                def __len__(self):
                    return self._n

                def __iter__(self):
                    raise AssertionError(
                        "host loader iterated during --log training")

            return (Poison(len(gen_train)), Poison(len(gen_val)),
                    Poison(len(gen_test)))

        monkeypatch.setattr(dsprites, "data_loaders", poisoned_loaders)
        tr.train_model(batch_size=32, num_epochs=1, log=True)
        assert tr.writer is not None
        assert tr._device_runner is not None


class TestResume:
    def test_maybe_resume_continues_step_count(self, dsprites, models_dir):
        """The CLIs' --resume surface: a fresh trainer restores the full
        train state (params, optimizer state, step) and continues the
        trajectory instead of restarting at step 0."""
        tr = make_trainer(dsprites)
        tr.train_model(batch_size=32, num_epochs=1, log=False)
        steps_per_epoch = int(tr.state.step)
        assert steps_per_epoch > 0

        tr2 = make_trainer(dsprites)
        assert tr2.maybe_resume()
        assert int(tr2.state.step) == steps_per_epoch
        tr2.train_model(batch_size=32, num_epochs=1, log=False)
        assert int(tr2.state.step) == 2 * steps_per_epoch

    def test_maybe_resume_without_checkpoint_trains_fresh(self, dsprites,
                                                          models_dir):
        tr = make_trainer(dsprites, rand=7)
        assert not tr.maybe_resume()


class TestFaderDeviceDataPath:
    def test_fader_trains_on_device_runner(self, dsprites, models_dir):
        from arvae_tpu.models.image_fader import DspritesFaderNetwork
        from arvae_tpu.training.fader_trainer import ImageFaderTrainer

        tr = ImageFaderTrainer(dsprites, DspritesFaderNetwork(), beta=1.0,
                               rand=0)
        tr.train_model(batch_size=32, num_epochs=1, log=False)
        # the adversarial two-optimizer step rode the device epoch
        # runner (VERDICT r3 item 3), not the host loader
        assert tr._device_runner is not None
        import jax

        assert all(
            np.all(np.isfinite(np.asarray(x)))
            for x in jax.tree_util.tree_leaves(tr.state.params)
        )
        # eval harvest also rides the device split
        z, attrs, attr_list = tr.compute_representations(_PoisonLoader())
        assert z.shape[0] == attrs.shape[0] > 0
        assert len(attr_list) == attrs.shape[1]


class TestDeviceSweepTailCoverage:
    def test_image_test_model_covers_partial_tail(self, dsprites, models_dir):
        """A batch size that doesn't divide the split must still cover
        the tail rows (host loaders are drop_last=False), with the same
        equal-per-batch weighting."""
        tr = make_trainer(dsprites)
        tr.ensure_state()
        sp = tr._device_eval_split()
        assert sp is not None and sp.n > 4
        bs = sp.n - 3  # one full batch + a 3-row tail
        m = tr.test_model(batch_size=bs)
        assert np.isfinite(m["test_loss"])
        # weighting check: two equal-weight batches means the value
        # differs from the full-split single batch unless the tail
        # happens to match — just assert both paths are finite and the
        # divisible case agrees with itself
        m_full = tr.test_model(batch_size=sp.n)
        assert np.isfinite(m_full["test_loss"])

    def test_split_scoped_jit_cache_lives_on_split(self, dsprites,
                                                   models_dir):
        tr = make_trainer(dsprites)
        tr.train_model(batch_size=32, num_epochs=1, log=False)
        tr.writer = _StubWriter()
        tr.eval_model(_PoisonLoader(), epoch_num=0)
        val_sp = tr._device_val_split()
        # the harvest jit is cached on the split (so a retrain's fresh
        # splits don't pin old HBM buffers via a trainer-held cache)
        assert any(k[0] == "harvest" for k in val_sp._trainer_jits)
        assert not hasattr(tr, "_harvest_jits")
        # second eval reuses the cached wrapper (no new keys)
        n_keys = len(val_sp._trainer_jits)
        tr.eval_model(_PoisonLoader(), epoch_num=1)
        assert len(val_sp._trainer_jits) == n_keys


class TestMeasureTestModelDevicePath:
    def test_test_model_skips_host_loaders(self, tmp_path_factory, monkeypatch):
        os.environ.setdefault(
            "ARVAE_DATASETS_DIR", str(tmp_path_factory.mktemp("music_deveval"))
        )
        from arvae_tpu.data.bar_dataset import FolkNBarDataset
        from arvae_tpu.models.measure_vae import MeasureVAE
        from arvae_tpu.training.measure_trainer import MeasureVAETrainer

        monkeypatch.setenv(
            "ARVAE_MODELS_DIR", str(tmp_path_factory.mktemp("models_deveval"))
        )
        folk = FolkNBarDataset(dataset_type="train", is_short=True, num_bars=1)
        model = MeasureVAE(
            num_notes=len(folk.note2index_dicts),
            encoder_hidden_size=32, decoder_hidden_size=32,
            latent_space_dim=16,
        )
        tr = MeasureVAETrainer(folk, model, reg_type=("all",),
                               reg_dim=(0, 1, 2, 3), rand=0, use_pallas=False)
        assert tr._device_eval_split() is not None

        def boom(*a, **k):
            raise AssertionError("host loader built on the device path")

        monkeypatch.setattr(folk, "data_loaders", boom)
        m = tr.test_model(batch_size=8)
        assert 0.0 <= m["test_acc"] <= 1.0
        assert np.isfinite(m["test_loss"])
