from quadtree_mpnnlstm_tpu.data.loader import (
    ArrayDataset,
    DataLoader,
    prefetch_to_device,
)
from quadtree_mpnnlstm_tpu.data.moving_mnist import (
    ModMovingMNIST,
    ModMovingMNISTDataset,
)

__all__ = [
    "ArrayDataset",
    "DataLoader",
    "prefetch_to_device",
    "ModMovingMNIST",
    "ModMovingMNISTDataset",
]
