"""Graph-convolution zoo over padded edge lists.

Feature parity with the reference's registry (ref model/model.py:39-57),
which wraps PyG's compiled scatter/SpMM kernels. Every conv here is one
pattern — gather → per-edge message (+ optional masked edge-softmax) →
masked segment-sum — expressed so XLA fuses the elementwise stages into the
surrounding matmuls. Weight matmuls are kept dense (N_max × F × O) so they
tile onto the MXU; only the O(E) gather/scatter is irregular.

Semantics notes (mirroring the reference's conv kwargs, model.py:49-57):
  * GCNConv: no self-loop insertion, symmetric degree norm, optional scalar
    edge weight (the graph builder's distance column).
  * ChebConv: K=3, 'sym' laplacian, lambda_max=2.
  * TransformerConv: heads=1, edge_dim=2, attention dropout 0.1, concat off.
  * MHTransformerConv: 3 concatenated heads + linear head-mixing
    (ref model.py:26-37).
  * GAT/GATv2: single head, edge features, PyG-default self-loop insertion
    with 'mean' edge-attr fill.
  * Dummy: identity (zero layers, ref model.py:75-76).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

try:  # private path — the public alias was deprecated in jax 0.4.x
    from jax._src.interpreters.batching import BatchTracer as _BatchTracer
except ImportError:  # pragma: no cover
    _BatchTracer = ()


def _is_batched_trace(*xs) -> bool:
    """True when any operand is a vmap BatchTracer (trace-time only)."""
    return any(
        isinstance(x, _BatchTracer)
        or (isinstance(x, jax.core.Tracer)
            and type(x).__name__ == "BatchTracer")
        for x in xs if x is not None
    )

from quadtree_mpnnlstm_tpu.graph.state import GraphTensors
from quadtree_mpnnlstm_tpu.ops.segment import (
    _NEG_BIG,
    aggregate_to_dst,
    edge_softmax,
    edge_softmax_graph,
    gather_dst,
    gather_rows,
    gather_src,
    safe_div,
    scatter_to_dst,
    segment_sum_nodes,
)

_glorot = nn.initializers.glorot_uniform()


def _dense(features: int, use_bias: bool = True, name: Optional[str] = None,
           dtype=None):
    # ``dtype`` is the flax compute dtype: params stay float32 masters and
    # are cast at use, so bf16 mode needs no separate param tree.
    return nn.Dense(
        features, use_bias=use_bias, kernel_init=_glorot, name=name,
        dtype=dtype,
    )


def _edge_weight(graph: GraphTensors) -> jnp.ndarray:
    """Scalar edge weight: last edge-attr column (the builder's distance),
    masked to 0 on invalid lanes. All-ones attrs ⇒ unweighted."""
    return graph.edge_attr[:, -1] * graph.edge_valid


def _sym_norm(graph: GraphTensors) -> jnp.ndarray:
    """D^{-1/2} A D^{-1/2} coefficients per edge (cached on the graph when
    the builder provides them — they are graph-constant)."""
    if getattr(graph, "sym_coeff", None) is not None:
        return graph.sym_coeff
    return compute_sym_norm(graph)


def compute_sym_norm(graph: GraphTensors) -> jnp.ndarray:
    w = _edge_weight(graph)
    n = graph.n_max
    if graph.max_degree > 0:
        from quadtree_mpnnlstm_tpu.ops.csr import csr_segment_sum

        deg = csr_segment_sum(w[:, None], graph.edge_dst, n,
                              graph.max_degree)[:, 0]
    else:
        deg = segment_sum_nodes(w, graph.edge_dst, n, indices_sorted=True)
    dinv = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
    return dinv[graph.edge_dst] * w * dinv[graph.edge_src]


def a_mul(z: jnp.ndarray, graph: GraphTensors) -> jnp.ndarray:
    """``Â z`` — the symmetric-normalised adjacency SpMM at the heart of
    GCN/Cheb convolutions, dispatched by the graph's aggregation backend:

      * ``pallas`` — fused VMEM-resident gather+scale+scatter kernel
        (ops/pallas_spmm.py; window metadata cached on the graph);
      * otherwise — XLA gather → scale → sorted scatter-add (with the CSR
        gather-expansion adjoint when ``max_degree`` > 0).

    ``GraphConfig.message_dtype="bfloat16"`` halves aggregation bandwidth
    by carrying the per-edge messages in bf16 (sums of ≤degree values,
    ~0.4% rounding; replaces the round-1 QTM_BF16_MSG env toggle).

    Â is feature-parallel, so a batch-middle ``(n, B, F)`` input (the
    shared-mesh batched layout, models/seq2seq.py) folds into one
    ``(n, B·F)`` call — batch widens the aggregation instead of
    multiplying dispatches.
    """
    if z.ndim == 3:
        n, b, f = z.shape
        return a_mul(z.reshape(n, b * f), graph).reshape(n, b, f)
    if graph.agg[0] == "grid":
        from quadtree_mpnnlstm_tpu.ops.grid import grid_a_mul

        return grid_a_mul(z, graph)
    if graph.agg[0] == "pallas":
        from quadtree_mpnnlstm_tpu.ops.pallas_spmm import spmm_apply

        _, nt, _eb, sw = graph.agg
        return spmm_apply(z, graph.agg_meta, graph.n_max, nt, sw)
    coeff = _sym_norm(graph).astype(z.dtype)  # stay in the compute dtype
    if graph.msg_dtype == "bfloat16":
        msg = (coeff[:, None] * gather_src(z, graph)).astype(jnp.bfloat16)
        return aggregate_to_dst(msg, graph).astype(z.dtype)
    return aggregate_to_dst(coeff[:, None] * gather_src(z, graph), graph)


class GCNConv(nn.Module):
    """Kipf-Welling GCN layer (no self-loop insertion, ref model.py:50)."""

    out_channels: int
    use_bias: bool = True
    dtype: Any = None  # flax compute dtype (None = follow inputs)

    @nn.compact
    def __call__(self, x, graph: GraphTensors, deterministic: bool = True):
        h = _dense(self.out_channels, use_bias=False, name="lin",
                   dtype=self.dtype)(x)
        out = a_mul(h, graph)
        if self.use_bias:
            out = out + self.param(
                "bias", nn.initializers.zeros, (self.out_channels,)
            ).astype(out.dtype)
        return out


class ChebConv(nn.Module):
    """Chebyshev spectral conv, 'sym' normalisation (ref model.py:53)."""

    out_channels: int
    K: int = 3
    lambda_max: float = 2.0
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, graph: GraphTensors, deterministic: bool = True):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        scale = 2.0 / self.lambda_max

        def l_hat(z):
            # (2/λmax)(I - Â) - I applied to z
            return scale * (z - a_mul(z, graph)) - z

        tx_prev = x
        out = _dense(self.out_channels, use_bias=False, name="lin_0",
                     dtype=self.dtype)(tx_prev)
        if self.K > 1:
            tx = l_hat(x)
            out = out + _dense(self.out_channels, use_bias=False,
                               name="lin_1", dtype=self.dtype)(tx)
            for k in range(2, self.K):
                tx, tx_prev = 2.0 * l_hat(tx) - tx_prev, tx
                out = out + _dense(
                    self.out_channels, use_bias=False, name=f"lin_{k}",
                    dtype=self.dtype,
                )(tx)
        if self.use_bias:
            out = out + self.param(
                "bias", nn.initializers.zeros, (self.out_channels,)
            ).astype(out.dtype)
        return out


def attr_dim(graph: GraphTensors) -> int:
    """Edge-attribute feature count of whichever mesh representation the
    graph carries (edge list, grid constants, or attention windows)."""
    if graph.edge_attr is not None:
        return graph.edge_attr.shape[-1]
    if graph.grid_attr is not None:
        return graph.grid_attr.shape[-1]
    if graph.attn_meta is not None:
        return graph.attn_meta.attr_t.shape[1]
    raise ValueError("graph carries no edge attributes")


def multi_stream_attention(
    q, k, v, we, graph: GraphTensors, heads: int, d: int,
    dropout: float = 0.0, deterministic: bool = True, rng=None,
):
    """Destination-aggregated edge attention for ``heads`` independent
    streams packed on the feature axis — the single implementation behind
    TransformerConv on every backend, and behind the fused gate stacks
    (models/fused.py) where the 2·G gate convolutions of a cell run as
    extra heads of one call.

    Args:
      q/k/v: (n_max, heads·d) projected node features.
      we: (A, heads·d) edge-projection weights, or None for no edge term.
      rng: dropout PRNG key (None or deterministic ⇒ no dropout).
    Returns:
      (out (n_max, heads, d), per-edge α or None — the fused Pallas path
      never materialises α globally).
    """
    n = graph.n_max

    if graph.agg[0] == "pallas_attn":
        from quadtree_mpnnlstm_tpu.ops.pallas_attn import (
            AttnDims,
            attn_apply,
        )

        _, nt, eb, sw = graph.agg
        t_tiles = graph.attn_meta.src_rel.shape[0]
        a = graph.attn_meta.attr_t.shape[1]
        if we is None:
            we = jnp.zeros((a, heads * d), q.dtype)
        if deterministic or dropout == 0.0 or rng is None:
            keep = jnp.ones((t_tiles, 1, eb), jnp.float32)
        else:
            keep = jax.random.bernoulli(
                rng, 1.0 - dropout, (t_tiles, heads, eb)
            ).astype(jnp.float32) / (1.0 - dropout)
        dims = AttnDims(n, nt, eb, sw, heads, d)
        out = attn_apply(q, k, v, we, keep, graph.attn_meta, dims)
        return out.reshape(n, heads, d), None

    if (
        graph.agg[0] == "grid"
        and graph.grid_attn_fused
        # the single-program kernel keeps ~8 (P, H) f32 buffers live in
        # VMEM (q, padded k/v, padded dk/dv, dq, g, out); very wide
        # stacks (e.g. gates-as-heads H = 2·G·heads·d) exceed the budget
        # — those fall back to the XLA chain
        and 8 * graph.agg[1] * graph.agg[2] * heads * d * 4 <= 80 * 2**20
        # vmap-of-pallas_call (the per-gate nn.vmap cell layout, or the
        # per-sample batched trainer) lowers with squeezed mid-axis block
        # specs Mosaic rejects at these shapes (TPU A/B r5: e_dir block
        # (Blocked(4), Squeezed, Blocked(32)) fails the (8,128)-divisible
        # check) — batched traces take the mathematically identical XLA
        # chain below instead
        and not _is_batched_trace(q, k, v, we)
    ):
        from quadtree_mpnnlstm_tpu.ops.pallas_grid_attn import (
            GridAttnDims,
            grid_attn_apply,
        )

        _, rows, cols, ndirs = graph.agg
        p = rows * cols
        if we is None:
            e_dir = jnp.zeros((ndirs, heads * d), q.dtype)
        else:
            e_dir = graph.grid_attr.astype(q.dtype) @ we  # (D, heads·d)
        valid = graph.node_valid.astype(q.dtype).reshape(p, 1)
        has_keep = rng is not None and not deterministic and dropout > 0.0
        if has_keep:
            # same draw as the XLA chain below ((D, rows, cols, heads)),
            # so the two backends agree bit-for-bit under one rng
            keep = jax.random.bernoulli(
                rng, 1.0 - dropout, (ndirs, rows, cols, heads)
            ).astype(jnp.float32).reshape(ndirs, p, heads) / (1.0 - dropout)
        else:
            keep = None
        dims = GridAttnDims(rows, cols, heads, d, ndirs, has_keep)
        out = grid_attn_apply(q, k, v, e_dir, valid, keep, dims)
        return out.reshape(p, heads, d), None

    if graph.agg[0] == "grid":
        from quadtree_mpnnlstm_tpu.ops.grid import (
            neighbor_valid,
            shift_in,
            shifts_for,
        )

        _, rows, cols, ndirs = graph.agg
        shifts = shifts_for(ndirs == 8)
        qg = q.reshape(rows, cols, heads, d)
        kg = k.reshape(rows, cols, heads, d)
        vg = v.reshape(rows, cols, heads, d)
        if we is None:
            e_dir = jnp.zeros((ndirs, 1, 1, heads, d), q.dtype)
        else:
            e_dir = (graph.grid_attr.astype(q.dtype) @ we).reshape(
                ndirs, 1, 1, heads, d
            )
        valid = graph.node_valid.reshape(rows, cols)
        nbv = jnp.stack(
            [neighbor_valid(valid, dr, dc) for dr, dc in shifts]
        )
        logits = jnp.stack(
            [
                jnp.sum(qg * (shift_in(kg, dr, dc) + e_dir[i]), axis=-1)
                for i, (dr, dc) in enumerate(shifts)
            ]
        ) / jnp.sqrt(jnp.asarray(d, q.dtype))
        logits = jnp.where(nbv[..., None], logits, _NEG_BIG)
        mx = jax.lax.stop_gradient(
            jnp.maximum(jnp.max(logits, axis=0), _NEG_BIG)
        )
        ex = jnp.where(nbv[..., None], jnp.exp(logits - mx[None]), 0.0)
        alpha = safe_div(ex, jnp.sum(ex, axis=0)[None])
        used = alpha
        if rng is not None and not deterministic and dropout > 0.0:
            keep = jax.random.bernoulli(
                rng, 1.0 - dropout, alpha.shape
            ).astype(alpha.dtype) / (1.0 - dropout)
            used = alpha * keep
        out = sum(
            used[i][..., None] * (shift_in(vg, dr, dc) + e_dir[i])
            for i, (dr, dc) in enumerate(shifts)
        )
        return out.reshape(rows * cols, heads, d), alpha

    # XLA edge-list path (gather → masked edge softmax → sorted scatter)
    qh = q.reshape(n, heads, d)
    kh = k.reshape(n, heads, d)
    vh = v.reshape(n, heads, d)
    kj = gather_src(kh, graph)
    vj = gather_src(vh, graph)
    if we is not None:
        e = (graph.edge_attr.astype(q.dtype) @ we).reshape(-1, heads, d)
        kj = kj + e
        vj = vj + e
    logits = jnp.sum(gather_dst(qh, graph) * kj, axis=-1) / jnp.sqrt(
        jnp.asarray(d, q.dtype)
    )
    alpha = edge_softmax_graph(logits, graph)
    used = alpha
    if rng is not None and not deterministic and dropout > 0.0:
        # Keyed by (src, dst) node ids, NOT edge-slot index, so the mask
        # is identical whichever adjacency backend ('sort' vs 'csum',
        # graph/adjacency.py) ordered the slots — training trajectories
        # are backend-independent (tests/test_adjacency_csum.py).
        def _edge_keep(s, t):
            ek = jax.random.fold_in(jax.random.fold_in(rng, s), t)
            return jax.random.bernoulli(ek, 1.0 - dropout, (heads,))

        keep = jax.vmap(_edge_keep)(
            graph.edge_src, graph.edge_dst
        ).astype(alpha.dtype) / (1.0 - dropout)
        used = alpha * keep
    out = aggregate_to_dst(used[..., None] * vj, graph)
    return out, alpha


class TransformerConv(nn.Module):
    """Graph transformer (UniMP-style) attention conv (ref model.py:51)."""

    out_channels: int
    heads: int = 1
    concat: bool = True
    dropout: float = 0.0
    edge_dim: Optional[int] = None
    root_weight: bool = True
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, graph: GraphTensors, deterministic: bool = True):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        h, d = self.heads, self.out_channels
        n = graph.n_max
        q = _dense(h * d, name="lin_query", dtype=self.dtype)(x)
        k = _dense(h * d, name="lin_key", dtype=self.dtype)(x)
        v = _dense(h * d, name="lin_value", dtype=self.dtype)(x)
        if self.edge_dim is not None:
            # applying lin_edge to the identity yields its kernel — one
            # param tree shared by every backend (checkpoint-compatible)
            a = attr_dim(graph)
            we = _dense(h * d, use_bias=False, name="lin_edge",
                        dtype=self.dtype)(jnp.eye(a, dtype=x.dtype))
        else:
            we = None
        rng = (
            self.make_rng("dropout")
            if (not deterministic and self.dropout > 0.0)
            else None
        )
        batched = x.ndim == 3  # batch-middle (n, B, F): samples run as
        if batched:            # extra heads of one call (shared mesh)
            b = x.shape[1]
            q, k, v = (t.reshape(n, b * h * d) for t in (q, k, v))
            we = None if we is None else jnp.tile(we, (1, b))
        out, alpha = multi_stream_attention(
            q, k, v, we, graph, (b * h) if batched else h, d,
            dropout=self.dropout, deterministic=deterministic, rng=rng,
        )
        if alpha is not None:
            # Debug side channel (ref model.py:79-93): per-edge α via flax
            # sow, materialised under mutable=["intermediates"]. The fused
            # Pallas path never materialises α (flash-style) — use
            # aggregation='xla' for attention-map dumps. Batched
            # (shared-mesh) runs sow (E, B, h) — samples ride as extra
            # heads internally but the dump keeps the batch axis explicit.
            self.sow(
                "intermediates", "alpha",
                alpha.reshape(alpha.shape[:-1] + (b, h)) if batched
                else alpha,
            )

        if batched:
            out = out.reshape(n, b, h, d)
        out = (
            out.reshape(out.shape[:-2] + (h * d,))
            if self.concat
            else jnp.mean(out, axis=-2)
        )
        if self.root_weight:
            skip_dim = h * d if self.concat else d
            out = out + _dense(skip_dim, use_bias=self.use_bias,
                               name="lin_skip", dtype=self.dtype)(x)
        return out


class MHTransformerConv(nn.Module):
    """TransformerConv with concatenated heads mixed back down by a linear
    layer (ref model.py:26-37)."""

    out_channels: int
    heads: int = 3
    dropout: float = 0.0
    edge_dim: Optional[int] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x, graph: GraphTensors, deterministic: bool = True):
        out = TransformerConv(
            out_channels=self.out_channels,
            heads=self.heads,
            concat=True,
            dropout=self.dropout,
            edge_dim=self.edge_dim,
            dtype=self.dtype,
            name="conv",
        )(x, graph, deterministic=deterministic)
        return _dense(self.out_channels, name="lin", dtype=self.dtype)(out)


def _with_self_loops(graph: GraphTensors):
    """Append one self-edge per valid node; edge attrs filled with the mean
    of valid edge attrs (PyG ``fill_value='mean'`` default used by the
    reference's GAT configs)."""
    n = graph.n_max
    idx = jnp.arange(n, dtype=graph.edge_src.dtype)
    # invalid nodes' self-edges carry the sentinel id (dropped bucket)
    self_idx = jnp.where(graph.node_valid, idx, n)
    src = jnp.concatenate([graph.edge_src, self_idx])
    dst = jnp.concatenate([graph.edge_dst, self_idx])
    valid = jnp.concatenate([graph.edge_valid, graph.node_valid])
    attr_sum = jnp.sum(
        graph.edge_attr * graph.edge_valid[:, None], axis=0
    )
    mean_attr = safe_div(attr_sum, jnp.maximum(graph.n_edges, 1).astype(attr_sum.dtype))
    attr = jnp.concatenate(
        [graph.edge_attr, jnp.broadcast_to(mean_attr[None], (n,) + mean_attr.shape)]
    )
    return src, dst, valid, attr


class _GATBase(nn.Module):
    out_channels: int
    heads: int = 1
    concat: bool = True
    negative_slope: float = 0.2
    dropout: float = 0.0
    edge_dim: Optional[int] = None
    add_self_loops: bool = True
    use_bias: bool = True
    v2: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, graph: GraphTensors, deterministic: bool = True):
        if graph.agg[0] == "grid":
            raise ValueError(
                "GAT convolutions need an edge-list mesh (self-loop "
                "insertion); build the pixelwise graph with "
                "aggregation='xla' instead of 'grid'"
            )
        if self.dtype is not None:
            x = x.astype(self.dtype)
        h, d = self.heads, self.out_channels
        n = graph.n_max
        if self.add_self_loops:
            src, dst, valid, attr = _with_self_loops(graph)
        else:
            src, dst, valid, attr = (
                graph.edge_src,
                graph.edge_dst,
                graph.edge_valid,
                graph.edge_attr,
            )
        attr = attr.astype(x.dtype)  # stay in the compute dtype
        # batch-middle (n, B, F) inputs keep the node axis 0; per-edge
        # tensors then carry (E, B, h[, d]) and the edge projection (no
        # batch axis of its own) broadcasts via an inserted axis
        batched = x.ndim == 3

        def heads_view(t):  # (..., h·d) → (..., h, d)
            return t.reshape(t.shape[:-1] + (h, d))

        def edge_bcast(e):  # (E, h, d) → (E, 1, h, d) when batched
            return e[:, None] if batched else e

        if self.v2:
            xl = heads_view(_dense(h * d, use_bias=self.use_bias,
                                   name="lin_l", dtype=self.dtype)(x))
            xr = heads_view(_dense(h * d, use_bias=self.use_bias,
                                   name="lin_r", dtype=self.dtype)(x))
            feat = gather_rows(xl, src) + gather_rows(xr, dst)
            if self.edge_dim is not None:
                e = _dense(h * d, use_bias=False, name="lin_edge",
                           dtype=self.dtype)(attr).reshape(-1, h, d)
                feat = feat + edge_bcast(e)
            att = self.param("att", _glorot, (1, h, d)).astype(feat.dtype)
            logits = jnp.sum(
                att * nn.leaky_relu(feat, self.negative_slope), axis=-1
            )
            src_feat = xl
        else:
            xw = heads_view(_dense(h * d, use_bias=False, name="lin",
                                   dtype=self.dtype)(x))
            att_src = self.param("att_src", _glorot, (1, h, d)).astype(xw.dtype)
            att_dst = self.param("att_dst", _glorot, (1, h, d)).astype(xw.dtype)
            a = (gather_rows(jnp.sum(xw * att_src, -1), src)
                 + gather_rows(jnp.sum(xw * att_dst, -1), dst))
            if self.edge_dim is not None:
                e = _dense(h * d, use_bias=False, name="lin_edge",
                           dtype=self.dtype)(attr).reshape(-1, h, d)
                att_edge = self.param(
                    "att_edge", _glorot, (1, h, d)
                ).astype(e.dtype)
                ea = jnp.sum(e * att_edge, -1)  # (E, h)
                a = a + (ea[:, None] if batched else ea)
            logits = nn.leaky_relu(a, self.negative_slope)
            src_feat = xw

        alpha = edge_softmax(logits, dst, valid, n)
        alpha = nn.Dropout(rate=self.dropout)(alpha, deterministic=deterministic)
        out = scatter_to_dst(
            alpha[..., None] * gather_rows(src_feat, src), dst, valid, n,
            indices_sorted=False,
        )
        out = (
            out.reshape(out.shape[:-2] + (h * d,))
            if self.concat
            else jnp.mean(out, axis=-2)
        )
        if self.use_bias:
            bias_dim = h * d if self.concat else d
            out = out + self.param(
                "bias", nn.initializers.zeros, (bias_dim,)
            ).astype(out.dtype)
        return out


class GATConv(_GATBase):
    pass


class GATv2Conv(_GATBase):
    v2: bool = True


# ---------------------------------------------------------------------------
# Registry + stacked wrapper (parity: ref model/model.py:39-97)
# ---------------------------------------------------------------------------

CONVOLUTIONS = {
    "GCNConv": GCNConv,
    "TransformerConv": TransformerConv,
    "MHTransformerConv": MHTransformerConv,
    "ChebConv": ChebConv,
    "GATConv": GATConv,
    "GATv2Conv": GATv2Conv,
    "Dummy": None,
}

CONVOLUTION_KWARGS = {
    "GCNConv": {},
    "TransformerConv": dict(heads=1, edge_dim=2, dropout=0.1, concat=False),
    "MHTransformerConv": dict(heads=3, edge_dim=2, dropout=0.1),
    "ChebConv": dict(K=3),
    "GATConv": dict(heads=1, edge_dim=2),
    "GATv2Conv": dict(heads=1, edge_dim=2),
    "Dummy": {},
}


def attention_map(intermediates, graph: GraphTensors) -> jnp.ndarray:
    """Reduce sown per-edge attention to an (n_max, 1) per-node map.

    TPU-native port of the ref's attention debug channel
    (ref model/model.py:81-93): the reference overwrite-loops
    ``att_map[dst] = alpha`` (last incoming edge wins, edge order
    arbitrary); here the max over each node's incoming edges is taken —
    deterministic and order-independent. ``intermediates`` is the mutable
    collection returned by ``model.apply(..., mutable=["intermediates"])``;
    the first sown α (first TransformerConv layer, matching the ref's
    ``convolutions[0]``) is used.
    """
    leaves = [
        v for path, v in jax.tree_util.tree_leaves_with_path(intermediates)
        if any(getattr(k, "key", None) == "alpha" for k in path)
    ]
    if not leaves:
        raise ValueError("no sown 'alpha' — run an attention conv with "
                         "mutable=['intermediates']")
    alpha = leaves[0]  # (E, heads); first layer's map, ref model.py:83
    if alpha.ndim == 4:
        # grid backend: α is (D, rows, cols, heads) — per-node max over
        # incoming directions and heads (same reduction as the edge path)
        att = jnp.max(alpha, axis=(0, -1)).reshape(-1)
        att = jnp.where(graph.node_valid, att, 0.0)
        return att[:, None]
    per_edge = jnp.max(alpha, axis=-1)
    per_edge = jnp.where(graph.edge_valid, per_edge, -jnp.inf)
    att = (
        jnp.full((graph.n_max + 1,), -jnp.inf, per_edge.dtype)
        .at[graph.edge_dst]
        .max(per_edge)[: graph.n_max]
    )
    return jnp.where(jnp.isfinite(att), att, 0.0)[:, None]


def dump_attention_map(path, x, att_map) -> None:
    """Write (x, att_map) as two stacked ``np.save`` records — the ref's
    scratch/attention_map.npy format (ref model/model.py:89-91)."""
    import numpy as np

    with open(path, "wb") as f:
        np.save(f, np.asarray(x))
        np.save(f, np.asarray(att_map))


class GraphConv(nn.Module):
    """A stack of ``n_layers`` same-type convolutions (no nonlinearity in
    between, ref model.py:59-97). ``Dummy`` ⇒ identity passthrough."""

    convolution_type: str
    out_channels: int
    n_layers: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, graph: GraphTensors, deterministic: bool = True):
        if self.convolution_type == "Dummy":
            return x
        cls = CONVOLUTIONS[self.convolution_type]
        kwargs = CONVOLUTION_KWARGS[self.convolution_type]
        for i in range(self.n_layers):
            x = cls(out_channels=self.out_channels, name=f"conv_{i}",
                    dtype=self.dtype, **kwargs)(
                x, graph, deterministic=deterministic
            )
        return x
