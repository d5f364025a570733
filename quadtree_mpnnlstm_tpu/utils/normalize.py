"""Array helpers (parity: ref model/utils.py:55-73)."""

from __future__ import annotations

import numpy as np


def normalize(arr: np.ndarray) -> np.ndarray:
    """Per-leading-index min-max over axes (0, 2, 3, 4) (ref utils.py:70-73)."""
    lo = np.min(arr, (0, 2, 3, 4))[:, None, None, None]
    hi = np.max(arr, (0, 2, 3, 4))[:, None, None, None]
    return (arr - lo) / (hi - lo)


def gen_x_y(arr, input_ts: int = 1, batch_size: int = 8, num_vars: int = 4):
    """Sliding-window (x, y) batch generator (ref utils.py:55-68)."""
    i = 0
    while i + batch_size + input_ts < arr.shape[0]:
        xs, ys = [], []
        for _ in range(batch_size):
            xs.append(arr[i : i + input_ts].reshape(input_ts, -1, num_vars))
            ys.append(arr[i + input_ts : i + input_ts + 1].reshape(-1, num_vars))
            i += 1
        yield np.array(xs), np.array(ys)[:, :, :1]
