"""Native C++ thinning must be bit-identical to the numpy reference."""

import numpy as np
import pytest

from arvae_tpu.data.morphomnist import native
from arvae_tpu.data.morphomnist.morpho import (
    ImageMorphology,
    _zhang_suen_thin_numpy,
)
from arvae_tpu.data.synthetic_digits import generate_digit_set


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_native_matches_numpy(lib):
    imgs, _ = generate_digit_set(8, seed=3)
    for img in imgs[:, 0]:
        m = ImageMorphology((img * 255).astype(np.uint8), scale=2)
        want = _zhang_suen_thin_numpy(m.binary_image)
        got = native.zhang_suen_thin_batch(m.binary_image[None])[0]
        np.testing.assert_array_equal(got, want)


def test_native_batch_shapes(lib):
    batch = (np.random.RandomState(0).rand(5, 32, 32) > 0.6)
    out = native.zhang_suen_thin_batch(batch)
    assert out.shape == batch.shape
    assert out.dtype == bool
    # thinning never adds pixels
    assert (out & ~batch).sum() == 0


def test_native_speedup(lib):
    import time

    imgs, _ = generate_digit_set(16, seed=4)
    bins = np.stack([
        ImageMorphology((im * 255).astype(np.uint8), scale=4).binary_image
        for im in imgs[:, 0]
    ])
    t0 = time.perf_counter()
    native.zhang_suen_thin_batch(bins)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for b in bins[:4]:
        _zhang_suen_thin_numpy(b)
    t_numpy_4 = time.perf_counter() - t0
    # native does 16 images faster than numpy does 4
    assert t_native < t_numpy_4
