"""Plotting and artifact generation (host-side).

Covers the reference's ``utils/plotting.py`` surface without
torchvision (grids are numpy) or pypianoroll (pianorolls are drawn
directly from the note tensor with matplotlib):

- ``make_grid`` / ``save_image_grid`` — torchvision ``make_grid`` /
  ``save_image`` equivalents.
- ``plot_dim`` — latent scatter colored by attribute, rasterized to an
  RGB array resized to 485×360 for tensorboard
  (reference plotting.py:41-63).
- ``save_gif`` / ``save_gif_from_list`` — PIL GIF writers
  (reference plotting.py:365-383).
- ``create_box_plot`` / ``create_pair_plot`` / ``create_scatter_plot``
  — the paper-figure seaborn plots (reference plotting.py:85-304).
- ``plot_pianoroll`` — pianoroll rendering with attribute sidebar
  (reference plot_pianoroll_from_midi, plotting.py:307-362, fed from
  the note tensor instead of a decoded MIDI file).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import seaborn as sns
from PIL import Image


# ---------------------------------------------------------------------------
# Image grids (torchvision make_grid / save_image equivalents)
# ---------------------------------------------------------------------------


def make_grid(
    images: np.ndarray, nrow: int = 8, padding: int = 2, pad_value: float = 0.0
) -> np.ndarray:
    """(N, C, H, W) → (C, H', W') tiled grid, matching torchvision layout."""
    images = np.asarray(images)
    n, c, h, w = images.shape
    ncol = nrow
    nrows = (n + ncol - 1) // ncol
    gh = nrows * (h + padding) + padding
    gw = ncol * (w + padding) + padding
    grid = np.full((c, gh, gw), pad_value, dtype=images.dtype)
    for i in range(n):
        r, col = divmod(i, ncol)
        y = r * (h + padding) + padding
        x = col * (w + padding) + padding
        grid[:, y : y + h, x : x + w] = images[i]
    return grid


def save_image_grid(
    images: np.ndarray,
    path: str,
    nrow: int = 8,
    padding: int = 2,
    pad_value: float = 0.0,
) -> None:
    grid = make_grid(images, nrow=nrow, padding=padding, pad_value=pad_value)
    arr = np.clip(grid * 255.0, 0, 255).astype(np.uint8)
    arr = np.transpose(arr, (1, 2, 0))
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(arr).save(path)


def grid_to_pil(grid: np.ndarray) -> Image.Image:
    """(C, H, W) float grid in [0,1] → PIL image."""
    arr = np.clip(grid * 255.0, 0, 255).astype(np.uint8)
    arr = np.transpose(arr, (1, 2, 0))
    if arr.shape[-1] == 1:
        arr = np.repeat(arr, 3, axis=-1)
    return Image.fromarray(arr)


# ---------------------------------------------------------------------------
# Latent scatters
# ---------------------------------------------------------------------------


def plot_dim(
    data: np.ndarray,
    target: np.ndarray,
    filename: str,
    dim1: int = 0,
    dim2: int = 1,
    xlim: Optional[float] = None,
    ylim: Optional[float] = None,
) -> np.ndarray:
    """Latent scatter colored by attribute; returns a 360×485×3 uint8
    array for tensorboard (reference plotting.py:41-63)."""
    fig, ax = plt.subplots(figsize=(6.4, 4.8))
    sc = ax.scatter(
        x=data[:, dim1], y=data[:, dim2], c=target.flatten(), s=4,
        cmap="viridis",
    )
    if xlim is not None:
        ax.set_xlim(-xlim, xlim)
    if ylim is not None:
        ax.set_ylim(-ylim, ylim)
    ax.set_xlabel(f"dim {dim1}")
    ax.set_ylabel(f"dim {dim2}")
    fig.colorbar(sc)
    os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
    fig.savefig(filename, dpi=100, bbox_inches="tight")
    fig.canvas.draw()
    img = np.asarray(fig.canvas.buffer_rgba())[..., :3]
    plt.close(fig)
    img = np.array(
        Image.fromarray(img).resize((485, 360), Image.BILINEAR)
    )
    return img


# ---------------------------------------------------------------------------
# GIFs
# ---------------------------------------------------------------------------


def save_gif_from_list(images: List[Image.Image], path: str,
                       duration: int = 200) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    images[0].save(
        path,
        save_all=True,
        append_images=images[1:],
        duration=duration,
        loop=0,
    )


def save_gif(tensor_frames: np.ndarray, path: str, duration: int = 200) -> None:
    """(T, C, H, W) float frames in [0,1] → GIF
    (reference plotting.py:365-374)."""
    frames = [grid_to_pil(f) for f in tensor_frames]
    save_gif_from_list(frames, path, duration=duration)


# ---------------------------------------------------------------------------
# Paper figures (reference plotting.py:85-304)
# ---------------------------------------------------------------------------


def create_scatter_plot(
    data_frame: pd.DataFrame,
    x_axis: str,
    y_axis: str,
    grouping: str,
    save_path: str,
    location: str = "lower right",
    anchor=(0.4, 94.5),
) -> None:
    """Interpretability-vs-reconstruction scatter with the β-VAE anchor
    point (reference plotting.py:143-181)."""
    fig, ax = plt.subplots(figsize=(6.4, 4.8))
    sns.scatterplot(
        data=data_frame, x=x_axis, y=y_axis, hue=grouping, style=grouping,
        s=60, ax=ax,
    )
    if anchor is not None:
        ax.scatter([anchor[0]], [anchor[1]], marker="*", s=200, c="red",
                   label="beta-VAE")
        ax.set_xlim(0.35, 0.95)
        ax.set_ylim(94.0, 98.0)
    ax.legend(loc=location)
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path, dpi=150, bbox_inches="tight")
    plt.close(fig)


def create_box_plot(
    data_frame: pd.DataFrame,
    x_axis: str,
    y_axis: str,
    grouping: str,
    save_path: str,
    anchor=None,
) -> None:
    """Metric box plots across models/datasets/seeds
    (reference plotting.py:184-304). ``anchor``: optional (x, y) point
    marked with a black 'x' (the reference's 96.15% digit-pred line) —
    it must be drawn on THIS axis before the figure is saved."""
    fig, ax = plt.subplots(figsize=(7.2, 4.8))
    sns.boxplot(data=data_frame, x=x_axis, y=y_axis, hue=grouping, ax=ax)
    if anchor is not None:
        ax.plot(anchor[0], anchor[1], "x", color="k")
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path, dpi=150, bbox_inches="tight")
    plt.close(fig)


def create_pair_plot(data_frame: pd.DataFrame, grouping: str,
                     save_path: str) -> None:
    """Seaborn pair plot (reference plotting.py:85-140)."""
    g = sns.pairplot(data_frame, hue=grouping, corner=True)
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    g.savefig(save_path, dpi=150)
    plt.close(g.figure)


def plot_grad_flow(named_grad_norms, save_path: str) -> None:
    """Gradient-flow debug plot (reference plotting.py:66-82): bar chart
    of per-parameter gradient norms."""
    names = list(named_grad_norms.keys())
    values = [float(v) for v in named_grad_norms.values()]
    fig, ax = plt.subplots(figsize=(max(6.0, len(names) * 0.35), 4.8))
    ax.bar(range(len(values)), values)
    ax.set_xticks(range(len(names)))
    ax.set_xticklabels(names, rotation=90, fontsize=6)
    ax.set_ylabel("grad norm")
    fig.tight_layout()
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path, dpi=120)
    plt.close(fig)


# ---------------------------------------------------------------------------
# Pianoroll (music artifacts)
# ---------------------------------------------------------------------------


def plot_pianoroll(
    pianoroll: np.ndarray,
    attr_labels: Optional[Sequence[float]],
    attr_str: str,
    save_path: str,
    ticks_per_measure: int = 24,
) -> None:
    """Renders a (T, 128) pianoroll with a per-measure attribute sidebar —
    the reference's pypianoroll figure (plotting.py:307-362) drawn
    directly with matplotlib."""
    t = pianoroll.shape[0]
    n_measures = max(t // ticks_per_measure, 1)
    fig, axes = plt.subplots(
        2 if attr_labels is not None else 1,
        1,
        figsize=(max(6.0, t / 12.0), 5.0),
        gridspec_kw={"height_ratios": [4, 1]} if attr_labels is not None else None,
        squeeze=False,
    )
    ax = axes[0][0]
    lo, hi = 36, 96
    ax.imshow(
        pianoroll[:, lo:hi].T,
        aspect="auto",
        origin="lower",
        cmap="Blues",
        interpolation="nearest",
        extent=(0, t, lo, hi),
    )
    for m in range(1, n_measures):
        ax.axvline(m * ticks_per_measure, color="gray", lw=0.5)
    ax.set_ylabel("MIDI pitch")
    if attr_labels is not None:
        ax2 = axes[1][0]
        xs = (np.arange(n_measures) + 0.5) * ticks_per_measure
        ax2.bar(xs, attr_labels[:n_measures], width=ticks_per_measure * 0.8)
        ax2.set_xlim(0, t)
        ax2.set_ylabel(attr_str)
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
