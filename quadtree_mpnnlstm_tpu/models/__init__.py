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
from quadtree_mpnnlstm_tpu.models.fused import FusedGateConvStack
from quadtree_mpnnlstm_tpu.models.seq2seq import Seq2Seq, Encoder, Decoder
from quadtree_mpnnlstm_tpu.models.mpnnlstm import MPNNLSTM, MPNNLSTMI
from quadtree_mpnnlstm_tpu.models.cnnlstm import (
    CNNEncoder,
    CNNDecoder,
    CNNLSTM,
    CNNLSTMSeq2Seq,
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
    "FusedGateConvStack",
    "Seq2Seq",
    "Encoder",
    "Decoder",
    "MPNNLSTM",
    "MPNNLSTMI",
    "CNNEncoder",
    "CNNDecoder",
    "CNNLSTM",
    "CNNLSTMSeq2Seq",
]
