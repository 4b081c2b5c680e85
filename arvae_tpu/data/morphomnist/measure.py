"""Batch morphometric measurement (reference morphomnist/measure.py:9-130).

Returns the six morphometrics (area, length, thickness, slant, width,
height) per image, with optional multiprocessing — the host-side
parallelism the reference uses for ``plot_latent_surface`` and the
Morpho-MNIST label CSVs.
"""

from __future__ import annotations

import multiprocessing
from typing import Optional

import numpy as np
import pandas as pd

from arvae_tpu.data.morphomnist.morpho import (
    ImageMoments,
    ImageMorphology,
    bounding_parallelogram,
)

COLUMNS = ["area", "length", "thickness", "slant", "width", "height"]


def measure_image(
    image,
    threshold: float = 0.5,
    scale: int = 4,
    bound_frac: float = 0.02,
    verbose: bool = False,
):
    """Computes the six morphometrics for one image
    (reference measure.py:9-62)."""
    image = np.asarray(image)
    if image.max() <= 0:  # blank image: all metrics zero
        return (0.0,) * 6
    morph = ImageMorphology(image, threshold, scale)
    moments = ImageMoments(morph.hires_image)
    thickness = morph.mean_thickness
    area = morph.area
    length = morph.stroke_length
    slant = float(np.arctan(-moments.horizontal_shear))

    corners = bounding_parallelogram(morph.hires_image, bound_frac, moments)
    width = (corners[1][0] - corners[0][0]) / morph.scale
    height = (corners[-1][1] - corners[0][1]) / morph.scale

    if verbose:
        print(
            f"Area {area:.1f}  Length {length:.1f}  Thickness {thickness:.2f}"
            f"  Slant {np.rad2deg(slant):.0f}deg  Dims {width:.1f}x{height:.1f}"
        )
    return area, length, thickness, slant, width, height


def _measure_image_unpack(arg):
    return measure_image(*arg)


def measure_batch(
    images,
    threshold: float = 0.5,
    scale: int = 4,
    bound_frac: float = 0.02,
    pool: Optional[multiprocessing.pool.Pool] = None,
    chunksize: int = 100,
) -> pd.DataFrame:
    """Morphometrics for a batch (reference measure.py:69-130)."""
    images = np.asarray(images)
    args = ((img, threshold, scale, bound_frac, False) for img in images)
    if pool is None:
        gen = map(_measure_image_unpack, args)
    else:
        gen = pool.imap(_measure_image_unpack, args, chunksize=chunksize)
    results = list(gen)
    return pd.DataFrame(results, columns=COLUMNS)
