"""Native host toolkit parity tests (native/qtm_host.cpp via ctypes)."""

import numpy as np
import pytest

from quadtree_mpnnlstm_tpu import native_ext

import oracle

pytestmark = pytest.mark.skipif(
    not native_ext.available(), reason="native library not built"
)


def test_native_quadtree_matches_oracle():
    rng = np.random.default_rng(0)
    for seed, (shape, max_size, thresh, pad, cond, with_mask) in enumerate([
        ((16, 16), 8, 0.5, 0, "max_larger_than", False),
        ((16, 16), 8, 0.5, 1, "max_larger_than", True),
        ((12, 20), 4, 0.3, 0, "min_smaller_than", True),
    ]):
        img = rng.random(shape)
        mask = (rng.random(shape) < 0.2) if with_mask else None
        ref = oracle.quadtree_labels(
            img, thresh=thresh, max_size=max_size, mask=mask, padding=pad,
            condition=cond,
        )
        ours, n = native_ext.quadtree_decompose(
            img, thresh=thresh, max_size=max_size, mask=mask, padding=pad,
            condition=cond,
        )
        assert oracle.partition_bijection(ref, ours) is not None
        assert n == len(np.unique(ref[ref >= 0]))


def test_native_adjacency_matches_oracle():
    rng = np.random.default_rng(1)
    img = rng.random((16, 16))
    mask = rng.random((16, 16)) < 0.15
    labels = oracle.quadtree_labels(img, thresh=0.5, max_size=8, mask=mask)
    src, dst = native_ext.adjacency(labels)
    ref_pairs = oracle.adjacency_pairs(labels)
    assert set(zip(src.tolist(), dst.tolist())) == ref_pairs
    # sorted by (dst, src)
    key = dst * (labels.max() + 2) + src
    assert np.all(np.diff(key) > 0)


def test_native_moving_sprites():
    sprites = np.zeros((2, 4, 4), np.float32)
    sprites[:, 1:3, 1:3] = 1.0
    vids = native_ext.moving_sprites(
        sprites, n_samples=3, t_total=5, canvas=16, n_digits=2,
        pixel_noise=0.0, velocity_noise=0.0, seed=42,
    )
    assert vids.shape == (3, 5, 16, 16)
    # each frame contains at least one sprite (max composite of 2 digits)
    assert (vids.reshape(3, 5, -1).max(-1) == 1.0).all()
    # deterministic under the same seed
    again = native_ext.moving_sprites(
        sprites, n_samples=3, t_total=5, canvas=16, n_digits=2,
        pixel_noise=0.0, velocity_noise=0.0, seed=42,
    )
    np.testing.assert_array_equal(vids, again)
