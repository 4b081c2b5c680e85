"""Morphological perturbation tests (thin/thicken/swell/fracture)."""

import numpy as np
import pytest

from arvae_tpu.data.morphomnist.morpho import ImageMorphology
from arvae_tpu.data.morphomnist.perturb import (
    Fracture,
    Swelling,
    Thickening,
    Thinning,
)
from arvae_tpu.data.morphomnist.skeleton import (
    LocationSampler,
    disk,
    get_angle,
    num_neighbours,
)
from arvae_tpu.data.synthetic_digits import render_digit


@pytest.fixture(scope="module")
def morph():
    img = (render_digit(0, thickness=1.8) * 255).astype(np.uint8)
    return ImageMorphology(img, scale=4)


def test_disk_shapes():
    d = disk(2)
    assert d.shape == (5, 5)
    assert d[2, 2] == 1 and d[0, 0] == 0


def test_thinning_reduces_area(morph):
    thin = Thinning(amount=0.7)(morph)
    assert thin.sum() < morph.binary_image.sum()


def test_thickening_increases_area(morph):
    thick = Thickening(amount=1.0)(morph)
    assert thick.sum() > morph.binary_image.sum()


def test_swelling_changes_image(morph):
    rng = np.random.RandomState(0)
    swollen = Swelling(rng=rng)(morph)
    assert swollen.shape == morph.binary_image.shape
    assert (swollen != morph.binary_image).sum() > 0


def test_fracture_removes_pixels(morph):
    rng = np.random.RandomState(0)
    frac = Fracture(num_frac=3, rng=rng)(morph)
    assert frac.shape == morph.binary_image.shape
    assert frac.sum() < morph.binary_image.sum()


def test_location_sampler_on_skeleton(morph):
    rng = np.random.RandomState(1)
    pts = LocationSampler(rng=rng).sample(morph, 5)
    assert pts.shape == (5, 2)
    for i, j in pts:
        assert morph.skeleton[i, j]


def test_num_neighbours_line():
    skel = np.zeros((5, 5), int)
    skel[2, 1:4] = 1
    nn = num_neighbours(skel)
    assert nn[2, 2] == 2
    assert nn[2, 1] == 1  # tip


def test_get_angle_horizontal_line():
    skel = np.zeros((11, 11))
    skel[5, :] = 1
    angle = get_angle(skel, 5, 5, 3)
    assert abs(abs(angle) % np.pi) < 0.2  # ~horizontal
