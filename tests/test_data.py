"""Data layer tests: loaders, procedural dSprites, synthetic digits,
morphometry."""

import numpy as np

from arvae_tpu.data.dsprites import DspritesDataset, generate_dsprites
from arvae_tpu.data.loaders import ArrayDataset, EpochLoader
from arvae_tpu.data.morphomnist.measure import measure_image
from arvae_tpu.data.morphomnist import io as idx_io
from arvae_tpu.data.synthetic_digits import generate_digit_set, render_digit

SMALL_FACTORS = (1, 3, 2, 4, 4, 4)


class TestLoaders:
    def test_split_sizes(self):
        ds = ArrayDataset(np.arange(100), np.arange(100) * 2)
        tr, va, ev = ds.data_loaders(10, split=(0.7, 0.2))
        # int((0.7+0.2)*100) == 89 under float arithmetic — identical to
        # the reference's split computation (bar_dataset.py:189-194)
        assert tr.n == 70 and va.n == 19 and ev.n == 11

    def test_shuffle_deterministic(self):
        dl = EpochLoader((np.arange(32),), 8, shuffle=True, seed=3)
        e1 = [b[0].copy() for b in dl]
        dl2 = EpochLoader((np.arange(32),), 8, shuffle=True, seed=3)
        e2 = [b[0].copy() for b in dl2]
        for a, b in zip(e1, e2):
            np.testing.assert_array_equal(a, b)

    def test_drop_last(self):
        dl = EpochLoader((np.arange(30),), 8, shuffle=False, drop_last=True)
        assert len(dl) == 3
        assert all(len(b[0]) == 8 for b in dl)


class TestDsprites:
    def test_generation_factors(self, tmp_path):
        packed, lat = generate_dsprites(SMALL_FACTORS)
        n = int(np.prod(SMALL_FACTORS))
        assert packed.shape == (n, 512)
        assert lat.shape == (n, 6)
        # latent columns span expected ranges
        assert lat[:, 1].min() == 1.0 and lat[:, 1].max() == 3.0
        assert lat[:, 2].min() == 0.5 and lat[:, 2].max() == 1.0

    def test_position_moves_sprite(self, tmp_path):
        ds = DspritesDataset(root=str(tmp_path), factor_sizes=SMALL_FACTORS)
        ds.load_dataset()
        # first row: all factors at min; posY varies fastest
        img0 = ds.unpack(ds.packed[:1])[0, 0]
        imgN = ds.unpack(ds.packed[3:4])[0, 0]  # posY max
        c0 = np.argwhere(img0 > 0).mean(0)
        cN = np.argwhere(imgN > 0).mean(0)
        assert cN[0] > c0[0] + 20  # sprite moved down
        assert abs(cN[1] - c0[1]) < 3  # same x

    def test_loaders_shapes(self, tmp_path):
        ds = DspritesDataset(root=str(tmp_path), factor_sizes=SMALL_FACTORS)
        tr, va, ev = ds.data_loaders(16)
        x, l = next(iter(tr))
        assert x.shape == (16, 1, 64, 64)
        assert l.shape == (16, 6)
        assert set(np.unique(x)).issubset({0.0, 1.0})

    def test_cache_roundtrip(self, tmp_path):
        ds1 = DspritesDataset(root=str(tmp_path), factor_sizes=SMALL_FACTORS)
        ds1.load_dataset()
        ds2 = DspritesDataset(root=str(tmp_path), factor_sizes=SMALL_FACTORS)
        ds2.load_dataset()
        np.testing.assert_array_equal(ds1.packed, ds2.packed)


class TestSyntheticDigits:
    def test_all_digits_render(self):
        for d in range(10):
            img = render_digit(d)
            assert img.shape == (28, 28)
            assert img.max() == 1.0 and img.sum() > 20

    def test_thickness_monotonic(self):
        thin = render_digit(0, thickness=0.7).sum()
        thick = render_digit(0, thickness=2.2).sum()
        assert thick > 1.5 * thin

    def test_generate_set_deterministic(self):
        a, la = generate_digit_set(16, seed=0)
        b, lb = generate_digit_set(16, seed=0)
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(la, lb)


class TestMorphometry:
    def test_slant_sign(self):
        right = render_digit(1, slant=0.4)
        left = render_digit(1, slant=-0.4)
        m_r = measure_image((right * 255).astype(np.uint8))
        m_l = measure_image((left * 255).astype(np.uint8))
        # slant = arctan(-shear); template x' = x + slant*(y_mid - y)
        assert m_r[3] > 0.15
        assert m_l[3] < -0.15

    def test_thickness_ordering(self):
        thin = measure_image((render_digit(0, thickness=0.8) * 255).astype(np.uint8))
        thick = measure_image((render_digit(0, thickness=2.0) * 255).astype(np.uint8))
        assert thick[2] > thin[2]
        assert thick[0] > thin[0]  # area too

    def test_blank_image(self):
        assert measure_image(np.zeros((28, 28), np.uint8)) == (0.0,) * 6


class TestIdxIO:
    def test_roundtrip(self, tmp_path):
        arr = np.random.RandomState(0).randint(0, 255, (5, 28, 28)).astype(np.uint8)
        p = str(tmp_path / "x-idx3-ubyte.gz")
        idx_io.save_idx(arr, p)
        np.testing.assert_array_equal(idx_io.load_idx(p), arr)


class TestDspritesRealNpz:
    def test_published_npz_format_loads(self, tmp_path, monkeypatch):
        """A file in the published dsprites .npz layout (imgs uint8 +
        latents_values) takes priority over procedural generation."""
        import arvae_tpu.data.dsprites as dsp

        sizes = (1, 2, 2, 2, 2, 2)
        n = int(np.prod(sizes))
        rng = np.random.RandomState(0)
        imgs = (rng.rand(n, 64, 64) > 0.8).astype(np.uint8)
        latents = rng.rand(n, 6).astype(np.float64)
        np.savez(
            str(tmp_path / dsp.DSPRITES_NPZ),
            imgs=imgs,
            latents_values=latents,
        )
        monkeypatch.setattr(dsp, "FULL_FACTOR_SIZES", sizes)

        ds = dsp.DspritesDataset(root=str(tmp_path), factor_sizes=sizes)
        ds.load_dataset()
        assert len(ds.packed) == n
        unpacked = ds.unpack(ds.packed[:4])
        np.testing.assert_array_equal(
            unpacked.reshape(4, 64, 64), imgs[:4].astype(np.float32)
        )
        np.testing.assert_allclose(
            ds.latents[:4], latents.astype(np.float32)[:4]
        )
