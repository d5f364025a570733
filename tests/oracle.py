"""Trusted numpy oracle for the quadtree graph engine.

A tiny, direct (recursive, dynamically-shaped) implementation of the
reference algorithm's *semantics* (ref model/graph_functions.py:145-259,
:261-356, :541-587), used as a test fixture. Label numbering is arbitrary —
tests compare partitions and label-mapped edge sets, since the model is
permutation-invariant over node ids.

Deliberate deviation from the reference: window bounds clamp at the true
array extents on both axes (the reference clamps rows with the column bound,
ref graph_functions.py:222-225 — harmless for square padded shapes, wrong
otherwise).
"""

from __future__ import annotations

import numpy as np


def _criterion(window: np.ndarray, thresh: float, condition: str) -> bool:
    if condition == "max_larger_than":
        return bool(window.max() > thresh)
    if condition == "max_smaller_than":
        return bool(window.max() < thresh)
    if condition == "min_larger_than":
        return bool(window.min() > thresh)
    if condition == "min_smaller_than":
        return bool(window.min() < thresh)
    raise ValueError(condition)


def quadtree_labels(
    img: np.ndarray,
    thresh: float = 0.05,
    max_size: int = 8,
    mask: np.ndarray | None = None,
    high_interest_region: np.ndarray | None = None,
    padding: int = 0,
    condition: str = "max_larger_than",
    transform=None,
) -> np.ndarray:
    """Per-pixel cell labels; -1 = invalid (masked)."""
    n, m = img.shape
    hp = -(-n // max_size) * max_size
    wp = -(-m // max_size) * max_size
    labels = np.full((hp, wp), -1, dtype=np.int64)
    imgp = np.pad(img, ((0, hp - n), (0, wp - m)), mode="edge")
    crit_img = transform(imgp) if transform is not None else imgp

    counter = [0]

    def visit(x: int, y: int, size: int):
        if x >= n or y >= m:
            return
        if size == 1:
            if mask is not None and mask[x, y]:
                return
            labels[x, y] = counter[0]
            counter[0] += 1
            return
        lo_r, hi_r = max(0, x - padding), min(x + size + 1 + padding, hp)
        lo_c, hi_c = max(0, y - padding), min(y + size + 1 + padding, wp)
        split = _criterion(crit_img[lo_r:hi_r, lo_c:hi_c], thresh, condition)
        if mask is not None:
            split = split or bool(mask[lo_r:hi_r, lo_c:hi_c].any())
        if high_interest_region is not None:
            split = split or bool(
                high_interest_region[lo_r:hi_r, lo_c:hi_c].any()
            )
        if split:
            h = size // 2
            for cx, cy in ((x, y), (x + h, y), (x, y + h), (x + h, y + h)):
                visit(cx, cy, h)
        else:
            labels[x : x + size, y : y + size] = counter[0]
            counter[0] += 1

    for i in range(hp // max_size):
        for j in range(wp // max_size):
            visit(i * max_size, j * max_size, max_size)

    return labels[:n, :m]


def adjacency_pairs(labels: np.ndarray, corners: bool = False) -> set:
    """Directed (src, dst) label pairs, dedup'd; self-pairs arise only from
    adjacent same-label pixels (multi-pixel cells), as in the reference."""
    n, m = labels.shape
    shifts = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    if corners:
        shifts += [(-1, -1), (1, -1), (-1, 1), (1, 1)]
    pairs = set()
    for i in range(n):
        for j in range(m):
            a = labels[i, j]
            if a == -1:
                continue
            for dr, dc in shifts:
                r, c = i + dr, j + dc
                if 0 <= r < n and 0 <= c < m:
                    b = labels[r, c]
                    if b != -1:
                        pairs.add((int(a), int(b)))
    return pairs


def node_means(img: np.ndarray, labels: np.ndarray) -> dict:
    """label → mean of img over the label's pixels. img: (rows, cols, c)."""
    out = {}
    flat_lab = labels.reshape(-1)
    flat_img = img.reshape(-1, img.shape[-1])
    for lab in np.unique(flat_lab):
        if lab == -1:
            continue
        out[int(lab)] = flat_img[flat_lab == lab].mean(axis=0)
    return out


def partition_bijection(labels_a: np.ndarray, labels_b: np.ndarray):
    """Return the a→b label bijection if the two labelings define the same
    partition (with coinciding -1s); otherwise None."""
    if labels_a.shape != labels_b.shape:
        return None
    a = labels_a.reshape(-1)
    b = labels_b.reshape(-1)
    if not ((a == -1) == (b == -1)).all():
        return None
    fwd, bwd = {}, {}
    for x, y in zip(a.tolist(), b.tolist()):
        if x == -1:
            continue
        if fwd.setdefault(x, y) != y or bwd.setdefault(y, x) != x:
            return None
    return fwd
