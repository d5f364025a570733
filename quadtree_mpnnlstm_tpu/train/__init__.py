from quadtree_mpnnlstm_tpu.train.losses import masked_mse, masked_bce
from quadtree_mpnnlstm_tpu.train.predictor import (
    NextFramePredictor,
    NextFramePredictorS2S,
)

__all__ = [
    "masked_mse",
    "masked_bce",
    "NextFramePredictor",
    "NextFramePredictorS2S",
]
