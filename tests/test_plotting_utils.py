"""Direct unit tests for the host-side artifact helpers
(``utils/plotting.py``, ``utils/profiling.py``) — previously exercised
only indirectly through the trainers' artifact sweeps."""

import numpy as np
import pytest
from PIL import Image

from arvae_tpu.utils.plotting import (
    grid_to_pil,
    make_grid,
    plot_dim,
    plot_pianoroll,
    save_gif,
    save_image_grid,
)

pytestmark = pytest.mark.fast


class TestMakeGrid:
    def test_layout_matches_torchvision(self):
        """16 8x8 single-channel tiles at nrow=8 -> 2 rows of 8, with
        `padding` pixels of pad_value around and between tiles."""
        imgs = np.stack(
            [np.full((1, 8, 8), i / 16.0, np.float32) for i in range(16)]
        )
        grid = make_grid(imgs, nrow=8, padding=2, pad_value=0.5)
        assert grid.shape == (1, 2 * 10 + 2, 8 * 10 + 2)
        # tile (r=1, c=3) sits at y=12, x=32
        np.testing.assert_allclose(grid[0, 12:20, 32:40], 11 / 16.0)
        # padding strip keeps pad_value
        np.testing.assert_allclose(grid[0, :2, :], 0.5)

    def test_partial_last_row(self):
        imgs = np.zeros((5, 1, 4, 4), np.float32)
        grid = make_grid(imgs, nrow=4, padding=1)
        assert grid.shape == (1, 2 * 5 + 1, 4 * 5 + 1)

    def test_save_roundtrip(self, tmp_path):
        imgs = np.random.RandomState(0).rand(4, 1, 6, 6).astype(np.float32)
        p = str(tmp_path / "grid.png")
        save_image_grid(imgs, p, nrow=2)
        arr = np.asarray(Image.open(p))
        assert arr.shape == (2 * 8 + 2, 2 * 8 + 2)
        assert arr.dtype == np.uint8

    def test_grid_to_pil_grayscale_to_rgb(self):
        pil = grid_to_pil(np.zeros((1, 5, 7), np.float32))
        assert pil.size == (7, 5) and pil.mode == "RGB"


class TestGifAndScatter:
    def test_save_gif_frames(self, tmp_path):
        frames = np.random.RandomState(1).rand(3, 1, 8, 8).astype(np.float32)
        p = str(tmp_path / "anim.gif")
        save_gif(frames, p)
        with Image.open(p) as im:
            assert im.n_frames == 3

    def test_plot_dim_returns_tb_image(self, tmp_path):
        rng = np.random.RandomState(2)
        img = plot_dim(
            rng.randn(50, 4), rng.rand(50), str(tmp_path / "dim.png"),
            dim1=0, dim2=2, xlim=3.0,
        )
        assert img.shape == (360, 485, 3) and img.dtype == np.uint8
        assert (tmp_path / "dim.png").exists()


class TestPianoroll:
    def test_with_and_without_sidebar(self, tmp_path):
        roll = np.zeros((48, 128), np.float32)
        roll[0:6, 60] = 1.0
        plot_pianoroll(roll, [0.5, 0.25], "rhy_complexity",
                       str(tmp_path / "pr.png"))
        plot_pianoroll(roll, None, "", str(tmp_path / "pr2.png"))
        assert (tmp_path / "pr.png").exists()
        assert (tmp_path / "pr2.png").exists()

    def test_sub_measure_roll(self, tmp_path):
        plot_pianoroll(np.zeros((7, 128), np.float32), [1.0], "x",
                       str(tmp_path / "pr3.png"))
        assert (tmp_path / "pr3.png").exists()


class TestProfiling:
    def test_step_timer_warmup(self):
        from arvae_tpu.utils.profiling import StepTimer

        t = StepTimer(warmup=2)
        assert np.isnan(t.steps_per_sec)
        for _ in range(5):
            t.tick()
        assert t.steps_per_sec > 0

    def test_step_timer_no_warmup(self):
        from arvae_tpu.utils.profiling import StepTimer

        t = StepTimer(warmup=0)
        t.tick()
        assert t.steps_per_sec > 0

    def test_assert_tree_finite(self):
        import jax.numpy as jnp

        from arvae_tpu.utils.profiling import assert_tree_finite

        assert_tree_finite({"a": jnp.ones(3), "n": jnp.arange(3)})
        with pytest.raises(ValueError, match="non-finite"):
            assert_tree_finite({"a": jnp.array([1.0, np.nan])})
