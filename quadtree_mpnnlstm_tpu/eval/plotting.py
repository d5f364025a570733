"""Mesh visualisation helpers (parity: ref model/graph_functions.py:99-113)."""

from __future__ import annotations

import numpy as np


def plot_contours(ax, labels: np.ndarray, color: str = "k", lw: float = 0.5):
    """Draw cell boundaries of a label image onto a matplotlib axis.

    Vectorised: finds all vertical/horizontal label discontinuities at once
    (the reference walks every pixel in Python, ref :99-113).
    """
    labels = np.asarray(labels)
    vdiff = labels[:, :-1] != labels[:, 1:]
    for i, j in zip(*np.nonzero(vdiff)):
        ax.plot([j + 0.5, j + 0.5], [i - 0.5, i + 0.5], c=color, lw=lw)
    hdiff = labels[:-1, :] != labels[1:, :]
    for i, j in zip(*np.nonzero(hdiff)):
        ax.plot([j - 0.5, j + 0.5], [i + 0.5, i + 0.5], c=color, lw=lw)
