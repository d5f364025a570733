"""Configuration dataclasses.

Replaces the reference's in-script constant blocks and integer experiment
selectors (ref: ice_exp.py:64-87) with hashable frozen dataclasses that can be
passed as jit static arguments. Every field that shapes the compiled program
(image shape, capacities, depths, timesteps) lives here so one config maps to
one XLA executable.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

# Split conditions, mirroring the reference registry
# (ref: model/graph_functions.py:15-20).
CONDITIONS = (
    "max_larger_than",
    "max_smaller_than",
    "min_larger_than",
    "min_smaller_than",
)

NEG_INF = float("-inf")


def _is_power_of_two(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


@dataclasses.dataclass(frozen=True)
class GraphConfig:
    """Static-shape description of the quadtree graph program.

    The reference builds graphs with data-dependent node/edge counts and a
    host round-trip per remesh (ref: model/graph_functions.py:590-681,
    :636). Here every graph tensor has a fixed capacity: ``n_max`` node slots
    and ``e_max`` directed-edge slots, with validity masks. That makes the
    whole decompose → map → adjacency pipeline a single statically-shaped XLA
    program that can run inside ``lax.scan`` (per-step remeshing stays
    on-device and jit-compiled).

    Attributes:
      image_shape: (rows, cols) of the field.
      max_grid_size: base-grid cell size, power of two
        (ref: graph_functions.py:176).
      thresh: split threshold; ``-inf`` selects the pixelwise path
        (ref: graph_functions.py:629-630).
      condition: split criterion name (ref: graph_functions.py:228-235).
      padding: extra halo when evaluating split criteria
        (ref: graph_functions.py:222-225).
      edges_at_corners: 8-neighbour adjacency (ref: graph_functions.py:319-327).
      use_edge_attrs: 2-feature (bearing, distance) edge attributes vs a
        single distance weight (ref: graph_functions.py:347-353).
      resolution: physical size of one pixel (ref: graph_functions.py:609).
      n_max / e_max: node / edge capacities. Defaults are exact worst cases
        (every pixel a node; all 4/8-neighbour directed pixel pairs).
    """

    image_shape: Tuple[int, int]
    max_grid_size: int = 8
    thresh: float = 0.05
    condition: str = "max_larger_than"
    padding: int = 0
    edges_at_corners: bool = False
    use_edge_attrs: bool = True
    resolution: float = 0.25
    n_max: Optional[int] = None
    e_max: Optional[int] = None
    max_degree: Optional[int] = None
    # Optional hard bound on live node count: when a mesh would exceed it,
    # the finest refinement level is coarsened globally (one level at a
    # time) until it fits — graceful, partition-consistent degradation
    # instead of the n_max overflow guard's silent raster-tail drop.
    # None = unbounded (reference parity). See quadtree._apply_node_budget.
    node_budget: Optional[int] = None
    # Aggregation backend for the Â·z SpMM inside GCN/Cheb convolutions:
    #   "xla"    — gather + sorted scatter-add (XLA default path)
    #   "pallas" — fused VMEM-resident one-hot-matmul kernel
    #              (ops/pallas_spmm.py; windows sized by agg_nt/eb/sw)
    #   "grid"   — dense shift-stencil over the raster grid (ops/grid.py);
    #              pixelwise meshes only (thresh=-inf), identity node
    #              mapping, no edge list — the speed-of-light path for the
    #              reference's committed flagship config (ice_exp.py:145)
    # (the CSR gather-expansion path is selected by max_degree > 0, as
    # before). Replaces the round-1 QTM_PALLAS env toggle.
    aggregation: str = "xla"
    # Window defaults sized from the 64×64 Moving-MNIST mesh (max measured
    # edge range 596 / src span 348 per 128-node tile); overflow is counted
    # per graph, so undersized windows surface via GraphTensors.overflow.
    agg_nt: int = 128   # node-tile rows per kernel step
    agg_eb: int = 1024  # edge-window slots per tile
    agg_sw: int = 512   # source-window rows per tile
    # With aggregation="pallas": pack attention windows (ops/pallas_attn)
    # instead of GCN/Cheb Â blocks — set (by the predictor) when the model
    # runs attention convolutions (Transformer/MHTransformer), whose
    # gather→edge-softmax→scatter chain the fused kernel replaces.
    attn_windows: bool = False
    # With aggregation="grid": backend for the attention convs' stencil
    # softmax chain — "pallas" fuses shifts/softmax/dropout/weighted-sum
    # into one VMEM kernel (ops/pallas_grid_attn.py; α never hits HBM, so
    # attention-map dumps need "xla"), "xla" keeps the shift/where chain.
    grid_attn: str = "xla"
    # dtype of aggregation message payloads; "bfloat16" halves the SpMM's
    # HBM traffic at ~0.4% rounding (replaces the QTM_BF16_MSG env toggle)
    message_dtype: str = "float32"
    # Raise at runtime (via jax.debug callback) when node/edge/window
    # capacity overflows would silently drop mesh content.
    debug_overflow: bool = False
    # Keep the edge list / geometry on built graphs. With the pallas
    # aggregation, GCN/Cheb models never read them after the Â blocks are
    # built, and carrying ~10 edge arrays through the remeshing scan costs
    # per-iteration DMA latency — the predictor sets this False when safe
    # (attention convs and the XLA/CSR backends still need them).
    carry_edges: bool = True
    # Edge dedup/grouping algorithm for quadtree meshes:
    #   "sort" — lexicographic (dst, src) sort of all shifted pixel pairs
    #            (4P keys) then mark-first dedup;
    #   "csum" — sort-free: each distinct cell pair is emitted exactly once
    #            from a canonical boundary pixel, and edges are packed
    #            dst-grouped by a counting scatter (cumsum ranks). Same
    #            edge set, different within-destination order. XLA sorts
    #            are the dominant remesh cost inside the decoder scan, so
    #            this is the fast path for remeshing workloads. 4-neighbour
    #            meshes only (edges_at_corners falls back to "sort").
    adjacency: str = "sort"

    def __post_init__(self):
        assert _is_power_of_two(self.max_grid_size), (
            f"max_grid_size must be a power of two, got {self.max_grid_size}"
        )
        assert self.condition in CONDITIONS, self.condition
        assert self.aggregation in ("xla", "pallas", "grid"), self.aggregation
        assert self.grid_attn in ("xla", "pallas"), self.grid_attn
        assert self.adjacency in ("sort", "csum"), self.adjacency
        if self.aggregation == "grid":
            assert self.pixelwise, (
                "aggregation='grid' needs the pixelwise mesh (thresh=-inf); "
                "quadtree meshes use 'xla' or 'pallas'"
            )
            assert self.n_max in (None, self.num_pixels), (
                "grid aggregation uses the identity node mapping: n_max "
                f"must be rows*cols={self.num_pixels}, got {self.n_max}"
            )
        if self.n_max is None:
            object.__setattr__(self, "n_max", self.num_pixels)
        if self.e_max is None:
            object.__setattr__(self, "e_max", self.num_pixels * self.num_dirs)
        if self.max_degree is None:
            # CSR aggregation (ops/csr.py) is opt-in: measured on v5e, the
            # (n_max × max_degree) gather expansion loses to XLA's sorted
            # scatter inside the fused train step (18.5 vs 65 frames/s).
            # Enable with max_degree=cfg.degree_bound for workloads where
            # gathers win (or when a Pallas CSR walker lands).
            object.__setattr__(self, "max_degree", 0)

    # -- derived static quantities ------------------------------------------------

    @property
    def rows(self) -> int:
        return self.image_shape[0]

    @property
    def cols(self) -> int:
        return self.image_shape[1]

    @property
    def num_pixels(self) -> int:
        return self.rows * self.cols

    @property
    def num_dirs(self) -> int:
        return 8 if self.edges_at_corners else 4

    @property
    def depth(self) -> int:
        """Number of split levels: cells go max_grid_size → 1."""
        return int(math.log2(self.max_grid_size))

    @property
    def padded_shape(self) -> Tuple[int, int]:
        g = self.max_grid_size
        return (-(-self.rows // g) * g, -(-self.cols // g) * g)

    @property
    def pixelwise(self) -> bool:
        return self.thresh == NEG_INF

    @property
    def degree_bound(self) -> int:
        """Provable per-node degree bound: a size-s cell has ≤ s neighbours
        per side (+ self-loop, + corner cells in 8-neighbour mode); the
        pixelwise mesh has degree ≤ 4 (8 with corners), no self-loops."""
        if self.pixelwise:
            deg = 8 if self.edges_at_corners else 4
        else:
            deg = 4 * self.max_grid_size + 5
            if self.edges_at_corners:
                deg += 4
        return min(deg, self.e_max)

    @property
    def edge_dim(self) -> int:
        return 2 if self.use_edge_attrs else 1

    def replace(self, **kw) -> "GraphConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Seq2Seq architecture hyper-parameters (ref: model/seq2seq.py:190-239).

    ``input_features`` counts raw channels only; positional encoding (2) and
    node size (1) are appended internally, mirroring
    ref: model/mpnnlstm.py:124.
    """

    hidden_size: int = 32
    dropout: float = 0.1
    input_features: int = 1
    input_timesteps: int = 3
    output_timesteps: int = 5
    n_layers: int = 1
    n_conv_layers: int = 3
    convolution_type: str = "GCNConv"
    rnn_type: str = "LSTM"
    binary: bool = False
    dummy: bool = False
    remesh_input: bool = False
    remesh_every: int = 1
    concat_layers_dim: int = 1
    fused_gates: bool = True  # shared-aggregation gate convs (models/fused.py)
    # NaN localization (ref graph_functions.py:626-627 asserts + the
    # commented torch.autograd.set_detect_anomaly, ice_profile.py:26): when
    # True, checkify.check()s inside the encoder/decoder scan bodies name
    # the module and rollout step that first produced a non-finite value,
    # instead of the trainer's epoch-end "NaN loss :(". Enabled by
    # NextFramePredictorS2S(debug=True); requires the caller to run the
    # model under checkify (the trainer's debug train step does).
    debug_nan: bool = False
    # Mixed-precision compute: "bfloat16" runs all matmuls/aggregations and
    # the graph pipeline in bf16 (params stay float32 masters — the trainer
    # casts them at use; LayerNorm statistics and the loss stay float32).
    # TPU MXU natively multiplies bf16 at 2× the f32 rate.
    compute_dtype: str = "float32"

    @property
    def cdtype(self):
        import jax.numpy as jnp

        # float64 is a test-only mode (requires jax_enable_x64): used to
        # separate structural from reassociation error in equivalence tests
        return {
            "float32": jnp.float32,
            "bfloat16": jnp.bfloat16,
            "float64": jnp.float64,
        }[self.compute_dtype]

    @property
    def node_input_features(self) -> int:
        # +2 positional encoding +1 node size (ref: mpnnlstm.py:124)
        return self.input_features + 3

    @property
    def uses_edge_attrs(self) -> bool:
        # Only attention convs consume 2-dim edge attributes
        # (ref: model/seq2seq.py:244-247).
        return self.convolution_type in (
            "MHTransformerConv",
            "TransformerConv",
            "GATConv",
        )

    def replace(self, **kw) -> "ModelConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimisation settings (ref: model/mpnnlstm.py:170-184)."""

    lr: float = 0.01
    lr_decay: float = 0.95
    lr_decay_every_epochs: int = 3  # StepLR(step_size=3) ref: mpnnlstm.py:175
    n_epochs: int = 20
    clip_norm: float = 10.0  # ref: mpnnlstm.py:251
    teacher_forcing_ratio: float = 0.0  # ref: mpnnlstm.py:237 (train uses 0)
    truncated_backprop: int = 0  # chunk size; 0 = full BPTT
    seed: int = 21  # ref: ice_exp.py:29-31
    # Model compute dtype; forwarded to ModelConfig.compute_dtype by the
    # predictor when a TrainConfig is passed (NextFramePredictorS2S
    # train_config=...). "bfloat16" = mixed precision (f32 masters).
    dtype: str = "float32"
    # Shared-mesh batched training: the whole batch rides ONE quadtree per
    # step (criterion = max over the batch — the batch analogue of the
    # builder's timestep-max, ref graph_functions.py:632) and node tensors
    # take the batch-middle (n_max, B, F) layout, so every aggregation
    # widens with B instead of dispatching per sample and the mesh build
    # amortises across the batch. Deviation from per-sample meshes (the
    # reference trains batch=1 and has no batch semantics to match);
    # eval/predict stay per-sample. See models/seq2seq.py batched paths.
    # RNG semantics also deviate from the vmapped path: the batch shares
    # ONE dropout/sampling key pair per step (the first sample's keys),
    # so dropout masks are common across the batch and the
    # teacher-forcing/scheduled-sampling Bernoulli draw is a single
    # batch-wide scalar per rollout step rather than per-sample draws.
    shared_mesh: bool = False

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)
