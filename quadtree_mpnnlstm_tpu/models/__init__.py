from quadtree_mpnnlstm_tpu.models.conv import (
    CONVOLUTIONS,
    CONVOLUTION_KWARGS,
    GraphConv,
    GCNConv,
    ChebConv,
    TransformerConv,
    MHTransformerConv,
    GATConv,
    GATv2Conv,
)
from quadtree_mpnnlstm_tpu.models.cells import (
    GConvLSTM,
    GConvGRU,
    GConvLSTMSimple,
    SplitGConvLSTM,
    DummyLSTM,
)
__all__ = [
    "CONVOLUTIONS",
    "CONVOLUTION_KWARGS",
    "GraphConv",
    "GCNConv",
    "ChebConv",
    "TransformerConv",
    "MHTransformerConv",
    "GATConv",
    "GATv2Conv",
    "GConvLSTM",
    "GConvGRU",
    "GConvLSTMSimple",
    "SplitGConvLSTM",
    "DummyLSTM",



]
