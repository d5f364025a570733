from quadtree_mpnnlstm_tpu.data.loader import ArrayDataset, DataLoader
from quadtree_mpnnlstm_tpu.data.moving_mnist import (
    ModMovingMNIST,
    ModMovingMNISTDataset,
)

__all__ = [
    "ArrayDataset",
    "DataLoader",
    "ModMovingMNIST",
    "ModMovingMNISTDataset",
]
