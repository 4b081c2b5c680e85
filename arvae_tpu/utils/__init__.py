from arvae_tpu.utils.plotting import (
    make_grid,
    save_image_grid,
    plot_dim,
    save_gif_from_list,
    save_gif,
)

__all__ = [
    "make_grid",
    "save_image_grid",
    "plot_dim",
    "save_gif_from_list",
    "save_gif",
]
