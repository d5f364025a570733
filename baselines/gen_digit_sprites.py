"""Generate the frozen real-handwriting digit sprite set.

The reference renders actual MNIST digits (fastai download + cv2 resize,
ref data/mod_moving_mnist.py:47-53). This image has no network access, so
the committed sprite set (`quadtree_mpnnlstm_tpu/data/digit_sprites.npz`)
is built from the *bundled* scikit-learn handwritten-digit scans (the UCI
ML hand-written digits set that ships inside sklearn — real pen strokes,
no download), cv2-resized 8×8 → 28×28 exactly as the reference resizes
MNIST. Run this once to regenerate; the npz is committed so runtime needs
neither sklearn nor cv2.

Usage: python baselines/gen_digit_sprites.py
"""

import os

import numpy as np

PER_CLASS = 5
OUT = os.path.join(
    os.path.dirname(__file__), "..", "quadtree_mpnnlstm_tpu", "data",
    "digit_sprites.npz",
)


def main():
    import cv2
    from sklearn.datasets import load_digits

    digits = load_digits()
    imgs, labels = digits.images, digits.target  # (1797, 8, 8) in [0, 16]
    sprites, labs = [], []
    for d in range(10):
        take = np.where(labels == d)[0][:PER_CLASS]
        for i in take:
            img = (imgs[i] / 16.0).astype(np.float32)
            big = cv2.resize(img, (28, 28), interpolation=cv2.INTER_CUBIC)
            big = np.clip(big, 0.0, 1.0)
            sprites.append(np.round(big * 255).astype(np.uint8))
            labs.append(d)
    sprites = np.stack(sprites)
    np.savez_compressed(
        os.path.abspath(OUT),
        sprites=sprites, labels=np.asarray(labs, np.int8),
    )
    print(f"wrote {os.path.abspath(OUT)}: {sprites.shape} uint8, "
          f"{os.path.getsize(os.path.abspath(OUT))} bytes")


if __name__ == "__main__":
    main()
