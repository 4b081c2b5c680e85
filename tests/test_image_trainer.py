"""End-to-end trainer tests on the 8-device CPU mesh with tiny data."""

import json
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


@pytest.fixture(scope="module")
def dsprites(tmp_path_factory):
    root = tmp_path_factory.mktemp("dsp")
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


class TestImageVAETrainer:
    def test_repr_string_semantics(self, dsprites, models_dir):
        tr = make_trainer(dsprites)
        assert tr.model_repr() == (
            "DspritesVAE_r_0_b_1.0_g_10.0_d_1.0_all_"
        )
        tr2 = make_trainer(dsprites, reg_type=(), reg_dim=(), beta=4.0)
        assert tr2.model_repr() == "DspritesVAE_r_4.0_b_4.0_".replace("4.0_b", "0_b")

    def test_loss_decreases(self, dsprites, models_dir):
        tr = make_trainer(dsprites)
        tr.ensure_state()
        tr._train_step_fn = tr.make_train_step()
        tr._eval_step_fn = tr.make_eval_step()
        gen_train, _, _ = dsprites.data_loaders(32, split=(0.7, 0.2))
        l0, _ = tr.loss_and_acc_on_epoch(gen_train, 0, train=True)
        l1, _ = tr.loss_and_acc_on_epoch(gen_train, 1, train=True)
        l2, _ = tr.loss_and_acc_on_epoch(gen_train, 2, train=True)
        assert l2 < l0

    def test_train_and_eval_metrics_cache(self, dsprites, models_dir):
        tr = make_trainer(dsprites)
        tr.train_model(batch_size=32, num_epochs=1, log=False)
        m = tr.compute_eval_metrics(batch_size=32)
        for key in ("interpretability", "Corr_score", "modularity_score",
                    "mig", "SAP_score", "test_loss", "test_acc"):
            assert key in m, key
        # cache exists and is reloaded
        fp = os.path.join(tr.run_dir, "results_dict.json")
        assert os.path.exists(fp)
        tr.metrics = {}
        m2 = tr.compute_eval_metrics(batch_size=32)
        assert json.dumps(m2, sort_keys=True, default=str) == json.dumps(
            m, sort_keys=True, default=str
        )

    def test_checkpoint_roundtrip(self, dsprites, models_dir):
        import jax

        tr = make_trainer(dsprites)
        tr.train_model(batch_size=32, num_epochs=1, log=False)
        params_before = jax.device_get(tr.state.params)
        tr2 = make_trainer(dsprites)
        tr2.load_model()
        params_after = jax.device_get(tr2.state.params)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b), params_before,
            params_after,
        )

    def test_interpolation_artifacts(self, dsprites, models_dir):
        tr = make_trainer(dsprites)
        tr.ensure_state()
        grid = tr.compute_latent_interpolations(
            np.zeros((1, 10), np.float32), dim1=2, num_points=4
        )
        assert grid.ndim == 3 and grid.shape[0] == 1
        grid2 = tr.compute_latent_interpolations2d(
            np.zeros((1, 10), np.float32), 1, 2, num_points=3
        )
        assert grid2.ndim == 3


class TestScalarRegDim:
    def test_scalar_reg_dim_zero_still_regularizes(self, dsprites, models_dir):
        """reg_dim=0 (a bare int, the convention the GLSR trainer uses)
        must mean 'regularize latent dim 0', not silently disable the
        reg loss via tuple(0 or ()) == ()."""
        tr = make_trainer(dsprites, reg_type=("shape",), reg_dim=0)
        assert tr.hparams.reg_dim == (0,)
        assert tr.hparams.use_reg_loss
        tr2 = make_trainer(dsprites, reg_type=("scale",), reg_dim=3)
        assert tr2.hparams.reg_dim == (3,)
        # empty reg_type still means no regularization
        tr3 = make_trainer(dsprites, reg_type=(), reg_dim=(1, 2))
        assert tr3.hparams.reg_dim == ()
