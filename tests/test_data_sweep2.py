"""Round-3 data-layer sweep behaviors: labels-as-rows DeviceSplit
aliasing (music splits store ONE HBM copy and run ONE gather
collective), dynamic vocab growth on unseen pitches (reference
bar_dataset.py:89-99), empty-corpus errors, the single dataset-root
resolver, and the MNIST archive-consistency guards."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from arvae_tpu.data.device_data import DeviceSplit
from arvae_tpu.parallel import create_mesh

N, D, B = 1003, 24, 32


@pytest.fixture(scope="module")
def ctx():
    return create_mesh()


@pytest.fixture(scope="module")
def rows():
    return np.random.RandomState(11).randint(0, 50, (N, D)).astype(np.int32)


class TestLabelsAreRows:
    @pytest.mark.parametrize("row_sharded", [True, False])
    def test_alias_matches_explicit_copy(self, ctx, rows, row_sharded):
        """labels=None gathers exactly what an explicit labels=rows.copy()
        split gathers, for both storage layouts."""
        alias = DeviceSplit(rows, None, (D,), "tokens", ctx,
                            row_sharded=row_sharded)
        explicit = DeviceSplit(rows, rows.copy(), (D,), "tokens", ctx,
                               row_sharded=row_sharded)
        assert alias.labels_are_rows and not explicit.labels_are_rows
        assert alias.labels is alias.images  # one HBM copy
        idx = jnp.asarray(
            np.random.RandomState(3).permutation(N)[:B].astype(np.int32))
        ga = jax.jit(alias.gather_batch)(alias.images, alias.labels, idx)
        ge = jax.jit(explicit.gather_batch)(
            explicit.images, explicit.labels, idx)
        np.testing.assert_array_equal(np.asarray(ga[0]), np.asarray(ge[0]))
        np.testing.assert_array_equal(np.asarray(ga[1]), np.asarray(ge[1]))
        np.testing.assert_array_equal(np.asarray(ga[0]), np.asarray(ga[1]))

    def test_rows_object_identity_also_aliases(self, ctx, rows):
        split = DeviceSplit(rows, rows, (D,), "tokens", ctx)
        assert split.labels_are_rows
        assert split.labels is split.images

    def test_sharded_alias_runs_one_collective(self, ctx, rows):
        """The aliased sharded gather lowers a single psum-scatter
        (reduce-scatter), not one per role."""
        alias = DeviceSplit(rows, None, (D,), "tokens", ctx,
                            row_sharded=True)
        idx = jnp.zeros((B,), jnp.int32)
        txt = jax.jit(alias.gather_batch).lower(
            alias.images, alias.labels, idx).compile().as_text()
        assert txt.count("reduce-scatter") == 1

    def test_music_splits_use_alias(self, ctx, tmp_path, monkeypatch):
        monkeypatch.setenv("ARVAE_DATASETS_DIR", str(tmp_path))
        from arvae_tpu.data.bar_dataset import FolkBarDataset

        tr, va = FolkBarDataset(is_short=True).device_splits(ctx)
        for sp in (tr, va):
            assert sp.labels_are_rows and sp.labels is sp.images


class TestVocabGrowth:
    def test_unseen_pitch_grows_vocab(self, ctx, tmp_path, monkeypatch):
        monkeypatch.setenv("ARVAE_DATASETS_DIR", str(tmp_path))
        from arvae_tpu.data.bar_dataset import FolkBarDataset
        from arvae_tpu.data.music_theory import midi_to_note_name

        ds = FolkBarDataset(is_short=True)
        name = midi_to_note_name(40)  # far below the [55, 84] vocab span
        assert name not in ds.note2index_dicts
        before = len(ds.note2index_dicts)
        tune = np.full((24,), -1, np.int64)
        tune[0] = 40
        ids = ds._tokens(tune)
        assert ds.note2index_dicts[name] == before  # appended at the end
        assert ids[0] == before
        assert ds.index2note_dicts[before] == name
        # persisted: a fresh dataset object reads the grown vocab back
        ds2 = FolkBarDataset(is_short=True)
        assert ds2.note2index_dicts[name] == before
        # attribute tables regenerate against the grown vocab
        assert ds.attrs.vocab_size == before + 1

    def test_stale_vocab_cache_grows_during_build(self, tmp_path,
                                                  monkeypatch):
        """A dict file cached from a different corpus can miss names the
        current corpus uses (e.g. --short cache, then a full run);
        make_dataset must grow the vocab so that sizing the model AFTER
        get_dataset() (as the CLIs do) covers every token id."""
        monkeypatch.setenv("ARVAE_DATASETS_DIR", str(tmp_path))
        from arvae_tpu.data.bar_dataset import (FolkBarDataset,
                                                _tune_token_names)
        from arvae_tpu.data.music_theory import (REST_SYMBOL, SLUR_SYMBOL)

        ds = FolkBarDataset(is_short=True)
        # a name the shift-0 corpus actually uses
        used = set()
        for tune in ds._corpus_tunes():
            used |= set(_tune_token_names(tune, 0))
        victim = sorted(used - {SLUR_SYMBOL, REST_SYMBOL})[-1]
        i2n = {i: n for i, n in ds.index2note_dicts.items() if n != victim}
        i2n = {j: n for j, n in enumerate(i2n.values())}
        n2i = {n: j for j, n in i2n.items()}
        with open(ds.dict_path, "w") as f:
            f.write("%s\n%s\n" % (i2n, n2i))

        stale = FolkBarDataset(is_short=True)
        assert victim not in stale.note2index_dicts
        score, _ = stale.get_dataset()
        assert victim in stale.note2index_dicts  # grown during build
        assert int(score.max()) < len(stale.note2index_dicts)

    def test_growth_is_idempotent(self, tmp_path, monkeypatch):
        monkeypatch.setenv("ARVAE_DATASETS_DIR", str(tmp_path))
        from arvae_tpu.data.bar_dataset import FolkBarDataset

        ds = FolkBarDataset(is_short=True)
        tune = np.full((24,), -1, np.int64)
        tune[0] = 40
        a = ds._tokens(tune)
        n_after = len(ds.note2index_dicts)
        b = ds._tokens(tune)
        np.testing.assert_array_equal(a, b)
        assert len(ds.note2index_dicts) == n_after


class TestEmptyCorpus:
    def test_bar_dataset_raises(self, tmp_path, monkeypatch):
        monkeypatch.setenv("ARVAE_DATASETS_DIR", str(tmp_path))
        from arvae_tpu.data.bar_dataset import FolkBarDataset

        ds = FolkBarDataset(is_short=True, dataset_type="test")
        ds._tunes = []
        with pytest.raises(ValueError, match="produced no 'test' bars"):
            ds.make_dataset()

    def test_all_submeasure_tunes_raise(self, tmp_path, monkeypatch):
        """Tunes shorter than one measure yield (0, 24) bar blocks; the
        guard must fire on total rows, not list emptiness."""
        monkeypatch.setenv("ARVAE_DATASETS_DIR", str(tmp_path))
        from arvae_tpu.data.bar_dataset import FolkBarDataset

        ds = FolkBarDataset(is_short=True)
        ds._tunes = [np.array([60, -1, -1], np.int64)]  # 3 ticks < 24
        with pytest.raises(ValueError, match="produced no 'train' bars"):
            ds.make_dataset()

    def test_nbar_dataset_raises(self, tmp_path, monkeypatch):
        monkeypatch.setenv("ARVAE_DATASETS_DIR", str(tmp_path))
        from arvae_tpu.data.bar_dataset import FolkNBarDataset

        ds = FolkNBarDataset(is_short=True, num_bars=1)
        ds._tunes = []
        with pytest.raises(ValueError, match="produced no 'train' windows"):
            ds.make_dataset()


class TestDatasetsRoot:
    def test_env_var_wins_everywhere(self, tmp_path, monkeypatch):
        monkeypatch.setenv("ARVAE_DATASETS_DIR", str(tmp_path))
        from arvae_tpu.data.loaders import datasets_root
        from arvae_tpu.data.bar_dataset import FolkBarDataset
        from arvae_tpu.data import dsprites, mnist

        assert datasets_root() == str(tmp_path)
        assert FolkBarDataset(is_short=True).dataset_dir_path == str(tmp_path)
        assert dsprites.DspritesDataset.__init__.__defaults__  # sanity
        ds = dsprites.DspritesDataset(factor_sizes=(1, 2, 2, 2, 2, 2))
        assert ds.root == os.path.join(str(tmp_path), "dsprites")
        assert mnist._default_root() == os.path.join(
            str(tmp_path), "mnist_data")

    def test_default_is_repo_relative(self, monkeypatch):
        monkeypatch.delenv("ARVAE_DATASETS_DIR", raising=False)
        from arvae_tpu.data.loaders import datasets_root

        import arvae_tpu

        pkg_parent = os.path.dirname(
            os.path.dirname(os.path.abspath(arvae_tpu.__file__)))
        assert os.path.normpath(datasets_root()) == os.path.normpath(
            os.path.join(pkg_parent, "datasets"))


class TestMnistArchiveGuards:
    def _tiny_synth(self, monkeypatch):
        import arvae_tpu.data.mnist as m

        monkeypatch.setattr(m, "SYNTH_TRAIN", 32)
        monkeypatch.setattr(m, "SYNTH_TEST", 16)
        return m

    def test_incomplete_archive_raises(self, tmp_path, monkeypatch):
        m = self._tiny_synth(monkeypatch)
        ds = m.MnistDataset(root=str(tmp_path))
        img_p, lab_p, _ = ds._paths("train")
        os.remove(lab_p)
        with pytest.raises(FileNotFoundError, match="incomplete MNIST"):
            m.MnistDataset(root=str(tmp_path))

    def test_stale_morpho_removed_on_regenerate(self, tmp_path, monkeypatch):
        m = self._tiny_synth(monkeypatch)
        ds = m.MnistDataset(root=str(tmp_path))
        img_p, lab_p, mor_p = ds._paths("train")
        # corrupt the morpho cache, then remove BOTH archives: the
        # regenerated synthetic set must not inherit the stale cache
        stale = np.zeros((5, 7), np.float32)
        import pandas as pd

        pd.DataFrame(stale).to_csv(mor_p, index=False)
        os.remove(img_p)
        os.remove(lab_p)
        ds2 = m.MnistDataset(root=str(tmp_path))
        assert ds2._full_train[2].shape[0] == ds2._full_train[0].shape[0]

    def test_mismatched_morpho_csv_remeasured(self, tmp_path, monkeypatch):
        """A morpho CSV whose row count doesn't match the archives (e.g.
        real archives dropped over a synthetic cache) is re-measured
        instead of loading misaligned labels."""
        m = self._tiny_synth(monkeypatch)
        ds = m.MnistDataset(root=str(tmp_path))
        _ = ds._full_train  # morphometrics are measured lazily on access
        _, _, mor_p = ds._paths("train")
        import pandas as pd

        truncated = pd.read_csv(mor_p).iloc[:5]
        truncated.to_csv(mor_p, index=False)
        ds2 = m.MnistDataset(root=str(tmp_path))
        assert ds2._full_train[2].shape[0] == ds2._full_train[0].shape[0]


class TestUndersizedModelGuard:
    def test_trainer_rejects_stale_sized_model(self, tmp_path, monkeypatch):
        monkeypatch.setenv("ARVAE_DATASETS_DIR", str(tmp_path))
        from arvae_tpu.data.bar_dataset import FolkNBarDataset
        from arvae_tpu.models.measure_vae import MeasureVAE
        from arvae_tpu.training.measure_trainer import MeasureVAETrainer

        ds = FolkNBarDataset(dataset_type="train", is_short=True, num_bars=1)
        model = MeasureVAE(
            num_notes=len(ds.note2index_dicts) - 1,  # stale-cache sizing
            note_embedding_dim=4, num_encoder_layers=1,
            encoder_hidden_size=8, latent_space_dim=4,
            num_decoder_layers=1, decoder_hidden_size=8,
        )
        with pytest.raises(ValueError, match="smaller than the finalized"):
            MeasureVAETrainer(dataset=ds, model=model)


class TestLazyMorpho:
    def test_plain_mnist_skips_measurement(self, tmp_path, monkeypatch):
        """The plain (image, digit) loaders never read the morpho
        columns, so constructing MnistDataset must not pay the
        process-pool measurement pass (minutes on a cold 60k cache)."""
        import arvae_tpu.data.mnist as m

        monkeypatch.setattr(m, "SYNTH_TRAIN", 24)
        monkeypatch.setattr(m, "SYNTH_TEST", 8)

        def boom(*a, **k):
            raise AssertionError("morphometrics measured eagerly")

        monkeypatch.setattr(m, "_measure_images", boom)
        ds = m.MnistDataset(root=str(tmp_path))
        tr, _, _ = ds.data_loaders(8)
        batch = next(iter(tr))
        assert len(batch) == 2  # (image, digit) only
        # first morpho access DOES measure
        import numpy as np

        monkeypatch.setattr(
            m, "_measure_images",
            lambda imgs: np.zeros((len(imgs), 6), np.float32))
        imgs, labels, morpho = ds._full_train
        assert morpho.shape == (len(imgs), 7)
