from .helpers import fig2img, giffify, plot_config
from .visualize_1d import (
    gen_p_y_pred,
    plot_dataset_samples_1d,
    plot_losses,
    plot_posterior_samples_1d,
    plot_prior_samples_1d,
)
from .visualize_imgs import (
    plot_dataset_samples_imgs,
    plot_img_marginal_pred,
    plot_posterior_samples_imgs,
    plot_qualitative_with_kde,
    points_to_grid,
)

__all__ = [
    "fig2img",
    "giffify",
    "plot_config",
    "plot_dataset_samples_1d",
    "plot_prior_samples_1d",
    "plot_posterior_samples_1d",
    "plot_losses",
    "gen_p_y_pred",
    "plot_dataset_samples_imgs",
    "plot_img_marginal_pred",
    "plot_posterior_samples_imgs",
    "plot_qualitative_with_kde",
    "points_to_grid",
]
