"""Plotting helpers for morphometric inspection
(reference morphomnist/util.py)."""

from __future__ import annotations

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from arvae_tpu.data.morphomnist.morpho import ImageMorphology


def plot_morphology(morph: ImageMorphology, save_path: str) -> None:
    """Side-by-side view of image / binarized / skeleton+distance map."""
    fig, axes = plt.subplots(1, 3, figsize=(9, 3))
    axes[0].imshow(morph.hires_image, cmap="gray")
    axes[0].set_title("image")
    axes[1].imshow(morph.binary_image, cmap="gray")
    axes[1].set_title("binary")
    overlay = morph.distance_map.copy()
    overlay[morph.skeleton] = overlay.max() + 1
    axes[2].imshow(overlay, cmap="magma")
    axes[2].set_title("skeleton + EDT")
    for ax in axes:
        ax.axis("off")
    fig.savefig(save_path, dpi=120, bbox_inches="tight")
    plt.close(fig)


def plot_grid(images: np.ndarray, save_path: str, ncol: int = 8) -> None:
    n = len(images)
    nrow = (n + ncol - 1) // ncol
    fig, axes = plt.subplots(nrow, ncol, figsize=(ncol * 1.2, nrow * 1.2),
                             squeeze=False)
    for i, ax in enumerate(axes.flat):
        if i < n:
            ax.imshow(images[i], cmap="gray")
        ax.axis("off")
    fig.savefig(save_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
