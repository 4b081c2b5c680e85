"""Morphological image analysis (host-side, numpy/scipy).

Re-implements the measurement capability of the vendored Morpho-MNIST
library in the reference (``data/dataloaders/morphomnist/morpho.py``)
without skimage, which is unavailable here:

- upscaling: ``scipy.ndimage.zoom`` (cubic) + gaussian smoothing, the
  same smoothing window skimage's ``pyramid_expand`` uses
  (sigma = 2 * upscale / 6).
- skeleton: Zhang–Suen thinning (vectorized numpy), standing in for
  skimage's lookup-table medial axis. Thickness/length formulas are
  unchanged; skeleton topology is equivalent for these metrics.
- distance map: ``scipy.ndimage.distance_transform_edt``.

Measured quantities (area, stroke length, mean thickness, slant via
image moments, bounding-parallelogram width/height) follow the
reference math exactly (``morpho.py:59-233``).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from scipy import ndimage

_SKEL_LEN_MASK = np.array(
    [[0.0, 0.0, 0.0], [0.0, 0.0, 1.0], [np.sqrt(2.0), 1.0, np.sqrt(2.0)]]
)


def zhang_suen_thin(img: np.ndarray, max_iter: int = 200) -> np.ndarray:
    """Binary skeleton via Zhang–Suen thinning.

    Dispatches to the native C++ batch kernel
    (:mod:`arvae_tpu.data.morphomnist.native`) when available; the numpy
    implementation below is the bit-identical fallback/reference.
    """
    from arvae_tpu.data.morphomnist import native

    out = native.zhang_suen_thin_batch(img[None], max_iter=max_iter)
    if out is not None:
        return out[0]
    return _zhang_suen_thin_numpy(img, max_iter)


def _zhang_suen_thin_numpy(img: np.ndarray, max_iter: int = 200) -> np.ndarray:
    img = img.astype(bool).copy()

    def neighbors(a):
        p = np.pad(a, 1, mode="constant").astype(np.uint8)
        # P2..P9 clockwise starting north
        P2 = p[:-2, 1:-1]
        P3 = p[:-2, 2:]
        P4 = p[1:-1, 2:]
        P5 = p[2:, 2:]
        P6 = p[2:, 1:-1]
        P7 = p[2:, :-2]
        P8 = p[1:-1, :-2]
        P9 = p[:-2, :-2]
        return P2, P3, P4, P5, P6, P7, P8, P9

    for _ in range(max_iter):
        changed = False
        for step in (0, 1):
            P2, P3, P4, P5, P6, P7, P8, P9 = neighbors(img)
            B = (
                P2.astype(np.int32) + P3 + P4 + P5 + P6 + P7 + P8 + P9
            )
            seq = [P2, P3, P4, P5, P6, P7, P8, P9, P2]
            A = np.zeros_like(B)
            for k in range(8):
                A += ((seq[k] == 0) & (seq[k + 1] == 1)).astype(np.int32)
            if step == 0:
                cond = (P2 * P4 * P6 == 0) & (P4 * P6 * P8 == 0)
            else:
                cond = (P2 * P4 * P8 == 0) & (P2 * P6 * P8 == 0)
            to_delete = img & (B >= 2) & (B <= 6) & (A == 1) & cond
            if to_delete.any():
                img[to_delete] = False
                changed = True
        if not changed:
            break
    return img


def _upscale(img: np.ndarray, scale: int) -> np.ndarray:
    """Cubic upscale + gaussian smoothing (skimage pyramid_expand analog)."""
    up = ndimage.zoom(img.astype(float), scale, order=3, mode="reflect")
    sigma = 2.0 * scale / 6.0
    up = ndimage.gaussian_filter(up, sigma=sigma)
    return np.clip(up, 0.0, None)


def _process_img_morph(img, threshold=0.5, scale=1):
    img = np.asarray(img, dtype=float)
    if scale > 1:
        img = _upscale(img, scale)
    img_min, img_max = img.min(), img.max()
    bin_img = img >= img_min + (img_max - img_min) * threshold
    skel = zhang_suen_thin(bin_img)
    dist_map = ndimage.distance_transform_edt(bin_img)
    return img, bin_img, skel, dist_map


class ImageMorphology:
    """Morphological processing pipeline for one image
    (reference morpho.py:20-102)."""

    def __init__(self, image, threshold: float = 0.5, scale: int = 1):
        self.image = np.asarray(image)
        self.threshold = threshold
        self.scale = scale
        (
            self.hires_image,
            self.binary_image,
            self.skeleton,
            self.distance_map,
        ) = _process_img_morph(self.image, threshold, scale)

    @property
    def area(self) -> float:
        return float(self.binary_image.sum()) / self.scale**2

    @property
    def stroke_length(self) -> float:
        skel = self.skeleton.astype(float)
        conv = ndimage.correlate(skel, _SKEL_LEN_MASK, mode="constant")
        up_length = float(np.einsum("ij,ij->", conv, skel))
        return up_length / self.scale

    @property
    def mean_thickness(self) -> float:
        if not self.skeleton.any():
            return 0.0
        return 2.0 * float(np.mean(self.distance_map[self.skeleton])) / self.scale

    @property
    def median_thickness(self) -> float:
        if not self.skeleton.any():
            return 0.0
        return 2.0 * float(np.median(self.distance_map[self.skeleton])) / self.scale


class ImageMoments:
    """First/second-order image moments (reference morpho.py:105-175)."""

    def __init__(self, img: np.ndarray):
        img = np.asarray(img, dtype=float)
        x = np.arange(img.shape[1])[None, :]
        y = np.arange(img.shape[0])[:, None]
        m00 = img.sum()
        m10 = (x * img).sum() / m00
        m01 = (y * img).sum() / m00
        m20 = (x**2 * img).sum() / m00
        m11 = (x * y * img).sum() / m00
        m02 = (y**2 * img).sum() / m00
        self.m00 = m00
        self.m10 = m10
        self.m01 = m01
        self.u20 = m20 - m10**2
        self.u11 = m11 - m10 * m01
        self.u02 = m02 - m01**2

    @property
    def centroid(self) -> Tuple[float, float]:
        return self.m10, self.m01

    @property
    def covariance(self) -> Tuple[float, float, float]:
        return self.u20, self.u11, self.u02

    @property
    def axis_lengths(self) -> Tuple[float, float]:
        delta = 0.5 * np.hypot(2.0 * self.u11, self.u20 - self.u02)
        eig1 = 0.5 * (self.u20 + self.u02) + delta
        eig2 = 0.5 * (self.u20 + self.u02) - delta
        return np.sqrt(max(eig1, 0.0)), np.sqrt(max(eig2, 0.0))

    @property
    def angle(self) -> float:
        return 0.5 * np.arctan2(2.0 * self.u11, self.u20 - self.u02)

    @property
    def horizontal_shear(self) -> float:
        return self.u11 / self.u02

    @property
    def vertical_shear(self) -> float:
        return self.u11 / self.u20


def _horz_cdf(img, shear, x, y, y_mid):
    locs = np.arange(0, img.shape[1], step=1)
    counts = np.zeros(len(locs))
    for i, t in enumerate(locs):
        counts[i] = ((x + 0.5 < t + shear * (y - y_mid)) * img).sum()
    return locs, counts / img.sum()


def _vert_cdf(img, y):
    counts = np.zeros(img.shape[0])
    for t in range(img.shape[0]):
        counts[t] = ((y < t) * img).sum()
    return counts / img.sum()


def bounding_parallelogram(img, frac: float, moments: ImageMoments = None):
    """Bounding parallelogram corners (reference morpho.py:193-233)."""
    img = np.asarray(img, dtype=float)
    height, width = img.shape
    x = np.arange(width)[None, :]
    y = np.arange(height)[:, None]

    if moments is None:
        moments = ImageMoments(img)
    middle = moments.centroid[1]
    shear = moments.horizontal_shear

    hloc, hcdf = _horz_cdf(img, shear, x, y, middle)
    vcdf = _vert_cdf(img, y)

    frac /= 2  # two-sided
    left, right = np.interp([frac, 1.0 - frac], hcdf, hloc)
    top, bottom = np.interp([frac, 1.0 - frac], vcdf, np.arange(len(vcdf)))

    top_left = np.array([left + shear * (top - middle), top])
    top_right = np.array([right + shear * (top - middle), top])
    bottom_left = np.array([left + shear * (bottom - middle), bottom])
    bottom_right = np.array([right + shear * (bottom - middle), bottom])

    return top_left, top_right, bottom_right, bottom_left
