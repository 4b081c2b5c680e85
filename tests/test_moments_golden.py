"""Golden tests for image moments + bounding parallelogram.

Values frozen from the pre-rewrite implementation (round 1, commit
57db85c^) on deterministic synthetic digits, so the round-2 rewrite of
the moments/parallelogram math (weighted-covariance decomposition,
histogram CDFs) provably preserves every measured quantity.
"""

import numpy as np

from arvae_tpu.data.morphomnist.measure import measure_image
from arvae_tpu.data.morphomnist.morpho import (
    ImageMoments,
    ImageMorphology,
    bounding_parallelogram,
)
from arvae_tpu.data.synthetic_digits import generate_digit_set
import pytest

pytestmark = pytest.mark.fast

# (m00, m10, m01, u20, u11, u02) per image
GOLDEN_MOMENTS = [
    (549263.6123687078, 61.12115976525569, 57.13686676609741,
     226.25980214898027, 112.44418507402224, 359.68796565231014),
    (860116.515505925, 62.805642893151955, 53.39953124845355,
     305.82093072321777, -137.5441116072625, 782.1539718132663),
    (356988.3150831645, 55.14943468845173, 57.5224784583464,
     172.24708009233382, 265.1564083725689, 547.1294498470065),
    (517029.08076531347, 53.92391815037463, 48.336312517184716,
     193.92227353797261, 51.86538823365936, 602.4500563361303),
]

# (major, minor, angle, horizontal_shear, vertical_shear)
GOLDEN_AXES = [
    (20.58445240969065, 12.736879005253652, 1.053140509499046,
     0.31261592216492345, 0.49696934234912665),
    (28.6184864419325, 16.39991269212765, -1.308936155659142,
     -0.17585298619451387, -0.44975375387810307),
    (26.16116945427148, 5.9135220236533526, 1.0930717493016044,
     0.48463194303782114, 1.539395664823059),
    (24.676545110634798, 13.690889353029943, 1.446466984879189,
     0.08609076833536164, 0.26745451818098354),
]

# corners clockwise from top-left, flattened (x0,y0,...,x3,y3), frac=0.02
GOLDEN_CORNERS = [
    (24.51854653196429, 27.02557229474312, 76.57514212297606,
     27.02557229474312, 99.43493439735754, 100.1497820793029,
     47.37833880634576, 100.1497820793029),
    (43.215474955635266, 5.568707463936167, 99.97604310212468,
     5.568707463936167, 82.98100514297423, 102.2121499605678,
     26.220436996484807, 102.2121499605678),
    (19.318471689058256, 20.29320652408752, 49.536045266236925,
     20.29320652408752, 89.19204441594357, 102.12025015874916,
     58.9744708387649, 102.12025015874916),
    (19.451006474486256, 18.46801418890453, 77.0146999117468,
     18.46801418890453, 83.99655718415167, 99.56680570168834,
     26.43286374689112, 99.56680570168834),
]

# (area, length, thickness, slant, width, height)
GOLDEN_MEASURE = [
    (129.375, 42.99568901432421, 3.609506617548816,
     -0.3029904736943675, 13.014148897752943, 18.281052446139945),
    (205.0625, 63.870057685088796, 3.899593294575833,
     0.17407318613586498, 14.190142036622353, 24.16086062415791),
    (82.6875, 25.47792206135786, 3.3299529694186627,
     -0.45127775023145095, 7.554393394294667, 20.45676090866541),
    (122.125, 27.717514421272195, 3.9005348126449655,
     -0.08587901848837673, 14.390923359315137, 20.27469787819595),
]


def _hires_images():
    imgs, _ = generate_digit_set(4, seed=11)
    return [(img * 255).astype(np.uint8) for img in imgs[:, 0]]


def test_moments_golden():
    for u8, want_m, want_ax in zip(_hires_images(), GOLDEN_MOMENTS,
                                   GOLDEN_AXES):
        m = ImageMoments(ImageMorphology(u8, scale=4).hires_image)
        got = (m.m00, m.m10, m.m01, m.u20, m.u11, m.u02)
        np.testing.assert_allclose(got, want_m, rtol=1e-8)
        major, minor = m.axis_lengths
        got_ax = (major, minor, m.angle, m.horizontal_shear,
                  m.vertical_shear)
        np.testing.assert_allclose(got_ax, want_ax, rtol=1e-8)


def test_bounding_parallelogram_golden():
    for u8, want in zip(_hires_images(), GOLDEN_CORNERS):
        hires = ImageMorphology(u8, scale=4).hires_image
        corners = bounding_parallelogram(hires, 0.02)
        got = np.concatenate(corners)
        np.testing.assert_allclose(got, np.array(want), rtol=1e-8)


def test_measure_image_golden():
    for u8, want in zip(_hires_images(), GOLDEN_MEASURE):
        np.testing.assert_allclose(measure_image(u8), want, rtol=1e-8)
