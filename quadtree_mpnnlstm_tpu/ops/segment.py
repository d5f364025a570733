"""Masked segment primitives for padded edge lists.

These are the TPU-native stand-ins for the reference's compiled
torch-scatter / torch-sparse kernels (ref requirements.txt:12-16): message
aggregation is a masked ``segment_sum`` over a fixed-capacity edge list, and
attention normalisation is a masked, numerically-guarded edge softmax.

Invariant maintained everywhere: **no NaN/Inf is ever materialised, even in
invalid (padded) lanes** — a NaN in a masked lane would still poison
gradients through ``where``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_NEG_BIG = -1e30


_SEGMENT_BACKEND = "off"


def set_segment_backend(mode: str) -> None:
    """Select the experimental MXU one-hot-matmul segment kernel:
    'off' | 'bwd' (gather backwards only) | 'all'.

    Measured trade-offs on v5e (Moving-MNIST train step): the *forward*
    aggregations ride sorted-sentinel edge lists, where XLA's sorted
    scatter inside a fused program beats the f32-precision one-hot matmul
    ('all' gave 65 → 4.5 frames/s). The *backward* of every feature gather
    is an UNSORTED scatter-add — XLA's worst case standalone — but measured
    end-to-end even 'bwd' loses to XLA's fused scatters (57 vs 65 frames/s),
    so the default is 'off' and the production SpMM path is
    ``GraphConfig(aggregation="pallas")`` instead (ops/pallas_spmm.py).
    Kept for ablation; call BEFORE tracing (jit caches bake the choice in).
    """
    assert mode in ("off", "bwd", "all"), mode
    global _SEGMENT_BACKEND
    _SEGMENT_BACKEND = mode


def _pallas_mode() -> str:
    if jax.default_backend() != "tpu":
        return "off"
    return _SEGMENT_BACKEND


def _use_pallas() -> bool:
    return _pallas_mode() == "all"


def pallas_segment_sum(values: jnp.ndarray, ids: jnp.ndarray, n_out: int):
    from quadtree_mpnnlstm_tpu.ops.pallas_segment import segment_sum_pallas

    squeeze = values.ndim == 1
    if squeeze:
        values = values[:, None]
    out = segment_sum_pallas(values, ids, n_out)
    return out[:, 0] if squeeze else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def gather_rows(x: jnp.ndarray, ids: jnp.ndarray, use_pallas_bwd: bool = True):
    """``x[ids]`` with a scatter-free backward.

    The VJP of a gather is a scatter-add — the slowest op class on TPU. Here
    the backward runs through the Pallas one-hot-matmul segment sum instead
    (ids need not be sorted). Out-of-range ids clamp like jnp indexing.
    """
    return jnp.take(x, jnp.minimum(ids, x.shape[0] - 1), axis=0)


def _gather_fwd(x, ids, use_pallas_bwd):
    return gather_rows(x, ids, use_pallas_bwd), (ids, x.shape[0])


def _gather_bwd(use_pallas_bwd, res, g):
    ids, n = res
    ids = jnp.minimum(ids, n - 1)
    shape = g.shape
    if use_pallas_bwd and _pallas_mode() in ("bwd", "all"):
        dx = pallas_segment_sum(g.reshape(shape[0], -1), ids, n)
    else:
        dx = jax.ops.segment_sum(
            g.reshape(shape[0], -1), ids, num_segments=n
        )
    return (dx.reshape((n,) + shape[1:]), None)


gather_rows.defvjp(_gather_fwd, _gather_bwd)


def safe_div(num: jnp.ndarray, den: jnp.ndarray) -> jnp.ndarray:
    """num/den with 0 where den == 0."""
    den_ok = den != 0
    return jnp.where(den_ok, num / jnp.where(den_ok, den, 1.0), 0.0)


def segment_sum_nodes(
    values: jnp.ndarray,
    ids: jnp.ndarray,
    n_max: int,
    indices_sorted: bool = False,
) -> jnp.ndarray:
    """Sum ``values`` (L, ...) into ``n_max`` node rows by ``ids`` (L,).

    ids may contain the sentinel ``n_max`` (dropped). Routes through the
    Pallas MXU kernel on TPU, XLA scatter elsewhere.
    """
    if _use_pallas():
        shape = values.shape
        out = pallas_segment_sum(values.reshape(shape[0], -1), ids, n_max)
        return out.reshape((n_max,) + shape[1:])
    out = jax.ops.segment_sum(
        values, ids, num_segments=n_max + 1, indices_are_sorted=indices_sorted
    )
    return out[:n_max]


def scatter_to_dst(
    messages: jnp.ndarray,
    edge_dst: jnp.ndarray,
    edge_valid: jnp.ndarray,
    n_max: int,
    indices_sorted: bool = True,
    mask_messages: bool = False,
) -> jnp.ndarray:
    """Aggregate per-edge messages (E, ...) at destination nodes (sum).

    Graph builders emit edge lists sorted by dst with invalid lanes carrying
    the sentinel id ``n_max`` (dropped bucket), so by default no masking is
    needed and the segment sum can assert sorted indices — a large win on
    TPU where unsorted scatter is the dominant cost. Callers whose messages
    are not already zero on invalid lanes must pass ``mask_messages=True``;
    callers that append edges out of order (e.g. GAT self-loops) must pass
    ``indices_sorted=False``.
    """
    if mask_messages:
        messages = jnp.where(
            edge_valid.reshape((-1,) + (1,) * (messages.ndim - 1)),
            messages, 0.0,
        )
    if _use_pallas():
        shape = messages.shape
        out = pallas_segment_sum(
            messages.reshape(shape[0], -1), edge_dst, n_max
        )
        return out.reshape((n_max,) + shape[1:])
    out = jax.ops.segment_sum(
        messages, edge_dst, num_segments=n_max + 1,
        indices_are_sorted=indices_sorted,
    )
    return out[:n_max]


def edge_softmax(
    logits: jnp.ndarray,
    edge_dst: jnp.ndarray,
    edge_valid: jnp.ndarray,
    n_max: int,
) -> jnp.ndarray:
    """Masked softmax of per-edge logits (E, H) over each destination's
    incoming edges — the attention normaliser of Transformer/GAT convs
    (stand-in for PyG's ``softmax(alpha, index)``).

    Invalid lanes get exactly 0; empty destinations produce no NaNs.
    """
    v = edge_valid.reshape((-1,) + (1,) * (logits.ndim - 1))
    logits = jnp.where(v, logits, _NEG_BIG)
    seg_max = jax.ops.segment_max(logits, edge_dst, num_segments=n_max + 1)
    # Empty segments give -inf; clamp so gathered differences stay finite.
    seg_max = jnp.maximum(seg_max, _NEG_BIG)
    seg_max = jax.lax.stop_gradient(seg_max)
    ex = jnp.exp(logits - seg_max[edge_dst])
    ex = jnp.where(v, ex, 0.0)
    denom = jax.ops.segment_sum(ex, edge_dst, num_segments=n_max + 1)
    return safe_div(ex, denom[edge_dst])


# --------------------------------------------------------------------------
# Graph-aware dispatchers: CSR (scatter-free, ops/csr.py) when the graph
# carries a degree cap, XLA scatter / plain gather otherwise.
# --------------------------------------------------------------------------


def aggregate_to_dst(messages: jnp.ndarray, graph) -> jnp.ndarray:
    """Sum per-edge messages at destination nodes using the graph's sorted
    edge list; both directions scatter-free when ``graph.max_degree`` > 0."""
    if graph.max_degree > 0:
        from quadtree_mpnnlstm_tpu.ops.csr import csr_segment_sum

        return csr_segment_sum(
            messages, graph.edge_dst, graph.n_max, graph.max_degree
        )
    return scatter_to_dst(
        messages, graph.edge_dst, graph.edge_valid, graph.n_max
    )


def gather_src(x: jnp.ndarray, graph) -> jnp.ndarray:
    """x[edge_src] with a CSR adjoint (via the graph's source-sorted view)."""
    if graph.max_degree > 0:
        from quadtree_mpnnlstm_tpu.ops.csr import gather_src_csr

        return gather_src_csr(
            x, graph.edge_src, graph.src_perm, graph.src_sorted,
            graph.n_max, graph.max_degree,
        )
    return gather_rows(x, graph.edge_src)


def gather_dst(x: jnp.ndarray, graph) -> jnp.ndarray:
    """x[edge_dst] with a CSR adjoint (ids already sorted)."""
    if graph.max_degree > 0:
        from quadtree_mpnnlstm_tpu.ops.csr import gather_dst_csr

        return gather_dst_csr(x, graph.edge_dst, graph.n_max, graph.max_degree)
    return gather_rows(x, graph.edge_dst)


def edge_softmax_graph(logits: jnp.ndarray, graph) -> jnp.ndarray:
    """Masked edge softmax over each destination's incoming edges, CSR-based
    when available (attention convs on the builders' sorted edge lists)."""
    if graph.max_degree == 0:
        return edge_softmax(logits, graph.edge_dst, graph.edge_valid,
                            graph.n_max)
    from quadtree_mpnnlstm_tpu.ops.csr import csr_segment_max, csr_segment_sum

    n, deg = graph.n_max, graph.max_degree
    v = graph.edge_valid.reshape((-1,) + (1,) * (logits.ndim - 1))
    logits = jnp.where(v, logits, _NEG_BIG)
    seg_max = csr_segment_max(logits, graph.edge_dst, n, deg)
    seg_max = jax.lax.stop_gradient(jnp.maximum(seg_max, _NEG_BIG))
    # gather of a stop-gradient needs no CSR adjoint
    ex = jnp.exp(logits - jnp.take(
        jnp.concatenate([seg_max, jnp.zeros((1,) + seg_max.shape[1:],
                                            seg_max.dtype)], 0),
        jnp.minimum(graph.edge_dst, n), axis=0))
    ex = jnp.where(v, ex, 0.0)
    denom = csr_segment_sum(ex, graph.edge_dst, n, deg)
    return safe_div(ex, gather_dst(denom, graph))
