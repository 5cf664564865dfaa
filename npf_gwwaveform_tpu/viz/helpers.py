"""Viz plumbing: fig->image, styled plotting context, GIF parameter sweeps.

Parity target: /root/reference/utils/visualize/helpers.py — `fig2img` (:21),
the seaborn `plot_config` context (:32-101), and `giffify` (:104-155).
"""

from __future__ import annotations

import contextlib
import io
from typing import Callable, Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def fig2img(fig, dpi: int = 100) -> np.ndarray:
    """Render a matplotlib figure to an RGB uint8 array."""
    buf = io.BytesIO()
    fig.savefig(buf, format="png", dpi=dpi, bbox_inches="tight")
    buf.seek(0)
    import PIL.Image

    return np.asarray(PIL.Image.open(buf).convert("RGB"))


@contextlib.contextmanager
def plot_config(style="whitegrid", font_scale=1.2, rc=None):
    """Temporarily apply a seaborn-ish plotting style."""
    try:
        import seaborn as sns

        with sns.axes_style(style), sns.plotting_context(
            "notebook", font_scale=font_scale, rc=rc or {}
        ):
            yield
    except ImportError:
        with plt.style.context("seaborn-v0_8-whitegrid" if "seaborn-v0_8-whitegrid" in plt.style.available else "default"):
            yield


def giffify(
    save_filename: str,
    gen_single_fig: Callable,
    sweep_parameter: str,
    sweep_values: Sequence,
    fps: int = 2,
    **kwargs,
):
    """Call `gen_single_fig(**{sweep_parameter: v}, **kwargs)` for each value
    and assemble the figures into a GIF (ref helpers.py:104-155)."""
    import imageio

    frames = []
    for v in sweep_values:
        fig = gen_single_fig(**{sweep_parameter: v}, **kwargs)
        frames.append(fig2img(fig))
        plt.close(fig)
    # pad frames to a common size (bbox_inches makes sizes vary slightly)
    h = max(f.shape[0] for f in frames)
    w = max(f.shape[1] for f in frames)
    padded = []
    for f in frames:
        canvas = np.full((h, w, 3), 255, np.uint8)
        canvas[: f.shape[0], : f.shape[1]] = f
        padded.append(canvas)
    imageio.mimsave(save_filename, padded, duration=int(1000 / fps), loop=0)
