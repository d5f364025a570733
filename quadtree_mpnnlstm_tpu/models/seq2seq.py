"""Graph seq2seq encoder–decoder with on-device per-step remeshing.

Parity target: ref model/seq2seq.py. The reference runs Python loops over
timesteps with mutable ``self.graph`` state and rebuilds the mesh on the
host every remesh (ref seq2seq.py:254-336, :339-398, :434-491). Here both
the encoder and the 90-step decoder rollout are ``nn.scan``s whose carry is
a :class:`Seq2SeqState` (mesh + recurrent state pytree); remeshing — predict
→ unflatten H/C → quadtree decompose → re-flatten — happens *inside* the
scan body under ``lax.cond``, fully jit-compiled.

Reference quirks preserved (checked by tests):
  * encoder layer 0 receives the *top* layer's (H, C) from the previous
    timestep; upper layers restart from zeros each step (ref :308-330, :71);
  * shared LayerNorm applied to every layer's H and C (ref :49-50, :123-125);
  * decoder conv stacks are 1 layer deep regardless of config (ref :106);
  * decoder head: ``tanh(gnn_out(relu(norm(top_O)) ⧺ concat)) + X[:, [0]]``
    — a residual delta on the previous value map (ref :160-175); the "top
    output" is the LSTM's output-gate activation (ref model.py:463);
  * decoder input is ``[value, pos_x, pos_y, node_size]`` seeded from the
    last encoder frame (ref :336);
  * teacher-forced non-remesh updates append the *raw* pixel count as the
    size feature (ref :420-424).

Documented deviations (reference behaviour is broken or stale there):
  * ``remesh_input`` skips the remesh after the last encoder frame (the
    reference indexes one frame past the end, ref :324);
  * with remeshing enabled and no climatology, the decoder's concat channel
    is the current prediction value at *every* step including t=0 (the
    reference only sets it from the first remesh on, ref :379, :471, :484,
    and would fail at t=0 with a statically-sized head layer).

Train/eval mode (dropout, scheduled sampling) is a *constructor* attribute —
build one ``Seq2Seq(..., deterministic=False, teacher_forcing_ratio=r)`` for
training and another for inference; they share the same parameter pytree.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from quadtree_mpnnlstm_tpu.config import GraphConfig, ModelConfig
from quadtree_mpnnlstm_tpu.graph.build import image_to_graph
from quadtree_mpnnlstm_tpu.graph.state import (
    GraphTensors,
    flatten,
    flatten_nb,
    unflatten,
    unflatten_nb,
)
from quadtree_mpnnlstm_tpu.models.cells import RNN_CELLS
from quadtree_mpnnlstm_tpu.models.conv import (
    CONVOLUTION_KWARGS,
    CONVOLUTIONS,
    GraphConv,
)
from quadtree_mpnnlstm_tpu.utils.posenc import add_positional_encoding


def _debug_check_finite(cfg: ModelConfig, value, message: str, **fmt):
    """NaN localization (ModelConfig.debug_nan): functionalized
    ``checkify.check`` naming the module/step that first went non-finite —
    the TPU-native stand-in for the reference's graph-input NaN asserts
    (graph_functions.py:626-627) and ``set_detect_anomaly``
    (ice_profile.py:26). No-op (and no tracing cost) unless debug_nan."""
    if not cfg.debug_nan:
        return
    from jax.experimental import checkify

    leaves = jax.tree_util.tree_leaves(value)
    ok = jnp.asarray(True)
    for leaf in leaves:
        ok = ok & jnp.isfinite(leaf).all()
    checkify.check(ok, message, **fmt)


@struct.dataclass
class Seq2SeqState:
    """Scan carry: current mesh, node input, per-layer recurrent state.

    ``hidden``/``cell`` are tuples with one (n_max, hidden) leaf per
    layer — NOT a stacked (n_layers, n_max, hidden) array. Stacked state
    forced a dynamic-slice per layer on every consume and a ``stack`` on
    every produce inside the scan body; the round-2 xplane trace showed
    those as real per-step DMA copies (PERF_NOTES round-3 DMA section).
    Leaves are free to index and rebuild.
    """

    graph: GraphTensors
    x: jnp.ndarray  # (n_max, F) current node input
    hidden: Tuple[jnp.ndarray, ...]  # n_layers × (n_max, hidden)
    cell: Tuple[jnp.ndarray, ...]    # n_layers × (n_max, hidden)


def _transfer_state(hc, old_graph, new_graph, shape):
    """Carry per-layer recurrent state across a remesh through pixel space:
    unflatten on the old mapping, flatten on the new (ref seq2seq.py:
    434-491 does the same via dense mapping matmuls). Batch-middle
    (n, B, hidden) leaves ride the shared meshes through the _nb pair."""

    def one(h):
        if h.ndim == 3:
            return flatten_nb(unflatten_nb(h, old_graph, shape), new_graph)
        return flatten(unflatten(h, old_graph, shape)[None], new_graph)[0]

    return tuple(one(h) for h in hc)


def _make_cells(cfg: ModelConfig, n_conv_layers: int, name: str):
    cell_cls = RNN_CELLS[cfg.rnn_type]
    kw = {}
    if cfg.rnn_type in ("LSTM", "GRU"):
        kw["fused"] = cfg.fused_gates
    return [
        cell_cls(
            out_channels=cfg.hidden_size,
            n_conv_layers=n_conv_layers,
            convolution_type=cfg.convolution_type,
            dtype=cfg.cdtype,
            name=f"{name}_{i}",
            **kw,
        )
        for i in range(cfg.n_layers)
    ]


class Encoder(nn.Module):
    """One encoder timestep over stacked cells (ref seq2seq.py:21-82)."""

    cfg: ModelConfig

    def setup(self):
        if not self.cfg.dummy:
            self.rnns = _make_cells(self.cfg, self.cfg.n_conv_layers, "rnn")
        # dtype: keep outputs in the compute dtype (stats are f32 inside)
        self.norm_h = nn.LayerNorm(epsilon=1e-5, dtype=self.cfg.cdtype)
        self.norm_c = nn.LayerNorm(epsilon=1e-5, dtype=self.cfg.cdtype)

    def __call__(
        self,
        x_t: jnp.ndarray,
        graph: GraphTensors,
        prev_hidden: Tuple[jnp.ndarray, ...],
        prev_cell: Tuple[jnp.ndarray, ...],
        deterministic: bool = True,
    ) -> Tuple[Tuple[jnp.ndarray, ...], Tuple[jnp.ndarray, ...]]:
        cfg = self.cfg
        if cfg.dummy:
            return prev_hidden, prev_cell

        is_gru = cfg.rnn_type == "GRU"
        # Layer 0 consumes the previous timestep's TOP layer state (ref :308-316).
        _, h, c = self.rnns[0](
            x_t, graph, prev_hidden[-1], prev_cell[-1], deterministic
        )
        h = self.norm_h(h)
        if not is_gru:
            c = self.norm_c(c)
        hs, cs = [h], [c]
        zero = jnp.zeros_like(h)
        for i in range(1, cfg.n_layers):
            _, h, c = self.rnns[i](hs[-1], graph, zero, zero, deterministic)
            h = self.norm_h(h)
            if not is_gru:
                c = self.norm_c(c)
            hs.append(h)
            cs.append(c)
        return tuple(hs), tuple(cs)


class Decoder(nn.Module):
    """One decoder timestep + output head (ref seq2seq.py:84-187)."""

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        # Decoder conv stacks are hard-coded 1 layer deep (ref :106).
        if not cfg.dummy:
            self.rnns = _make_cells(cfg, 1, "rnn")
        conv_cls = CONVOLUTIONS[cfg.convolution_type]
        kwargs = CONVOLUTION_KWARGS[cfg.convolution_type]
        if conv_cls is None:  # Dummy convolution type → identity head convs
            self.fc_out1 = GraphConv(
                convolution_type="Dummy", out_channels=cfg.hidden_size,
                name="fc_out1",
            )
            self.fc_out2 = GraphConv(
                convolution_type="Dummy", out_channels=1, name="fc_out2"
            )
        else:
            self.fc_out1 = conv_cls(
                out_channels=cfg.hidden_size, name="fc_out1",
                dtype=cfg.cdtype, **kwargs
            )
            self.fc_out2 = conv_cls(out_channels=1, name="fc_out2",
                                    dtype=cfg.cdtype, **kwargs)
        self.norm_o = nn.LayerNorm(epsilon=1e-5, dtype=self.cfg.cdtype)
        self.norm_h = nn.LayerNorm(epsilon=1e-5, dtype=self.cfg.cdtype)
        self.norm_c = nn.LayerNorm(epsilon=1e-5, dtype=self.cfg.cdtype)
        self.drop = nn.Dropout(rate=cfg.dropout)

    def gnn_out(self, x, graph, deterministic):
        x = self.fc_out1(x, graph, deterministic)
        x = nn.relu(x)
        x = self.fc_out2(x, graph, deterministic)
        return self.drop(x, deterministic=deterministic)

    def __call__(
        self,
        x: jnp.ndarray,
        graph: GraphTensors,
        concat_layers: Optional[jnp.ndarray],
        hidden: Tuple[jnp.ndarray, ...],
        cell: Tuple[jnp.ndarray, ...],
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...], Tuple[jnp.ndarray, ...]]:
        cfg = self.cfg
        if cfg.dummy:
            inp = x if concat_layers is None else jnp.concatenate(
                [x, concat_layers], axis=-1
            )
            out = self.gnn_out(inp, graph, deterministic)
            return out, hidden, cell

        is_gru = cfg.rnn_type == "GRU"
        out, h, c = self.rnns[0](x, graph, hidden[0], cell[0], deterministic)
        h = self.norm_h(h)
        if not is_gru:
            c = self.norm_c(c)
        hs, cs = [h], [c]
        for i in range(1, cfg.n_layers):
            out, h, c = self.rnns[i](
                hs[-1], graph, hidden[i], cell[i], deterministic
            )
            h = self.norm_h(h)
            if not is_gru:
                c = self.norm_c(c)
            hs.append(h)
            cs.append(c)

        output = nn.relu(self.norm_o(out))
        if concat_layers is not None:
            output = jnp.concatenate([output, concat_layers], axis=-1)
        output = self.gnn_out(output, graph, deterministic)
        output = jnp.tanh(output) + x[..., [0]]  # residual on previous value (ref :174)
        if cfg.binary:
            output = nn.sigmoid(output)
        return output, tuple(hs), tuple(cs)


class _EncoderScanStep(nn.Module):
    """Fixed-mesh encoder scan body; carry=(hidden, cell), xs=data_t."""

    cfg: ModelConfig
    deterministic: bool = True

    @nn.compact
    def __call__(self, carry, graph, x_t):
        hidden, cell = carry
        enc = Encoder(self.cfg, name="encoder")
        hidden, cell = enc(x_t, graph, hidden, cell, self.deterministic)
        _debug_check_finite(
            self.cfg, hidden,
            "non-finite hidden state in module=encoder (fixed-mesh scan "
            "step); inputs or encoder weights went NaN",
        )
        return (hidden, cell), None


class _EncoderRemeshStep(nn.Module):
    """remesh_input encoder scan body (ref seq2seq.py:493-527): encode the
    current frame's mesh, then (unless last) rebuild the mesh from the next
    frame and transfer H/C through pixel space."""

    cfg: ModelConfig
    gcfg: GraphConfig
    deterministic: bool = True
    transform_func: Optional[Callable] = None

    @nn.compact
    def __call__(self, carry, consts, xs):
        state: Seq2SeqState = carry
        mask, hir = consts
        next_frame, is_last = xs
        enc = Encoder(self.cfg, name="encoder")
        hidden, cell = enc(
            state.x, state.graph, state.hidden, state.cell, self.deterministic
        )
        _debug_check_finite(
            self.cfg, hidden,
            "non-finite hidden state in module=encoder (remesh_input scan "
            "step); inputs or encoder weights went NaN",
        )
        shape = self.gcfg.image_shape

        def remesh(_):
            # batched (shared-mesh) steps carry (B, rows, cols, C) frames:
            # ONE mesh from the batch-max criterion (the batch analogue of
            # image_to_graph's timestep-max, ref graph_functions.py:632),
            # node data in the batch-middle (n, B, C+1) layout
            batched = next_frame.ndim == 4
            new_graph, data = image_to_graph(
                next_frame if batched else next_frame[None],
                self.gcfg,
                mask=mask,
                high_interest_region=hir,
                transform_func=self.transform_func,
            )
            new_x = jnp.moveaxis(data, 0, 1) if batched else data[0]
            # running max so the final state reports the whole rollout's
            # worst capacity overflow (surfaced by the trainer); None on
            # hand-built meshes
            if state.graph.overflow is not None:
                new_graph = new_graph.replace(
                    overflow=jnp.maximum(
                        new_graph.overflow, state.graph.overflow
                    )
                )
            return Seq2SeqState(
                graph=new_graph,
                x=new_x,
                hidden=_transfer_state(hidden, state.graph, new_graph, shape),
                cell=_transfer_state(cell, state.graph, new_graph, shape),
            )

        def keep(_):
            return Seq2SeqState(
                graph=state.graph, x=state.x, hidden=hidden, cell=cell
            )

        new_state = jax.lax.cond(is_last, keep, remesh, None)
        return new_state, None


class _DecoderScanStep(nn.Module):
    """Decoder rollout scan body (ref seq2seq.py:339-398): decode, emit the
    pixel-space prediction through the *current* mapping, then remesh or
    carry the mesh forward."""

    cfg: ModelConfig
    gcfg: GraphConfig
    deterministic: bool = True
    teacher_forcing_ratio: float = 0.0
    use_climatology: bool = False
    transform_func: Optional[Callable] = None

    @nn.compact
    def __call__(self, carry, consts, xs):
        cfg, gcfg = self.cfg, self.gcfg
        state: Seq2SeqState = carry
        mask, hir, graph_const = consts
        t, clim_t, y_t = xs
        shape = gcfg.image_shape
        remeshing = not gcfg.pixelwise
        # Non-remeshing rollouts keep the mesh OUT of the scan carry
        # (graph_const broadcast): carrying ~10 mesh arrays cost
        # per-iteration DMA copies in the round-2 trace (PERF_NOTES).
        graph = state.graph if state.graph is not None else graph_const

        # batch-middle (n, B, F) node tensors ⇒ shared-mesh batched rollout
        batched = state.x.ndim == 3

        # -- concat layers (climatology or self-value, see module docstring)
        if self.use_climatology:
            if clim_t.ndim == state.x.ndim:
                # pre-flattened node-space climatology (hoisted out of the
                # scan for fixed meshes — decode())
                concat = clim_t.astype(state.x.dtype)
            elif batched:
                # (B, rows, cols, 1) → (n, B, 1)
                concat = flatten_nb(
                    jnp.moveaxis(clim_t, 0, 2).astype(state.x.dtype), graph
                )
            else:
                concat = flatten(
                    clim_t[None].astype(state.x.dtype), graph
                )[0]
        elif remeshing:
            concat = state.x[..., [0]]
        else:
            concat = None

        dec = Decoder(cfg, name="decoder")
        output, hidden, cell = dec(
            state.x, graph, concat, state.hidden, state.cell,
            self.deterministic,
        )
        _debug_check_finite(
            cfg, output,
            "non-finite output in module=decoder at rollout step t={t}",
            t=t,
        )
        if batched:
            # (n, B, 1) → (B, rows, cols, 1): per-sample emission; also the
            # remesh criterion stack (batch-max, see do_remesh)
            y_hat_t = jnp.moveaxis(
                unflatten_nb(output, graph, shape, fill=0.0), 2, 0
            )
        else:
            y_hat_t = unflatten(output, graph, shape, fill=0.0)

        # -- scheduled sampling (ref :389-390)
        if self.teacher_forcing_ratio > 0.0:
            key = self.make_rng("sampling")
            teacher_force = jax.random.bernoulli(
                key, self.teacher_forcing_ratio
            )
        else:
            teacher_force = jnp.asarray(False)

        def do_remesh(_):
            # ref seq2seq.py:434-491; batched: ONE mesh per step from the
            # batch-max criterion (batch analogue of the builder's
            # timestep-max, ref graph_functions.py:632)
            base = jnp.where(teacher_force, y_t.astype(y_hat_t.dtype), y_hat_t)
            frame = add_positional_encoding(base if batched else base[None])
            new_graph, data = image_to_graph(
                frame, gcfg, mask=mask, high_interest_region=hir,
                transform_func=self.transform_func,
            )
            # running max overflow across the rollout (see encoder remesh)
            if graph.overflow is not None:
                new_graph = new_graph.replace(
                    overflow=jnp.maximum(
                        new_graph.overflow, graph.overflow
                    )
                )
            return Seq2SeqState(
                graph=new_graph,
                x=jnp.moveaxis(data, 0, 1) if batched else data[0],
                hidden=_transfer_state(hidden, graph, new_graph, shape),
                cell=_transfer_state(cell, graph, new_graph, shape),
            )

        def no_remesh(_):
            # ref seq2seq.py:420-431
            if self.teacher_forcing_ratio > 0.0:
                teach_pe = add_positional_encoding(
                    (y_t if batched else y_t[None]).astype(output.dtype)
                )
                if batched:
                    teach_nodes = jnp.moveaxis(flatten(teach_pe, graph), 0, 1)
                    counts_col = jnp.broadcast_to(
                        graph.counts[:, None, None],
                        teach_nodes.shape[:-1] + (1,),
                    ).astype(output.dtype)
                else:
                    teach_nodes = flatten(teach_pe, graph)[0]
                    counts_col = graph.counts[:, None].astype(output.dtype)
                x_teach = jnp.concatenate([teach_nodes, counts_col], axis=-1)
                x_pred = jnp.concatenate([output, state.x[..., 1:]], axis=-1)
                x_new = jnp.where(teacher_force, x_teach, x_pred)
            else:
                x_new = jnp.concatenate([output, state.x[..., 1:]], axis=-1)
            return Seq2SeqState(
                graph=state.graph, x=x_new, hidden=hidden, cell=cell
            )

        if remeshing and cfg.remesh_every == 1:
            # Static fast path: the predicate is always true, and under
            # vmap/remat a lax.cond lowers to a select that executes BOTH
            # branches every step (measured ~10% extra) — skip it.
            new_state = do_remesh(None)
        elif remeshing:
            do_it = jnp.mod(t + 1, cfg.remesh_every) == 0
            new_state = jax.lax.cond(do_it, do_remesh, no_remesh, None)
        else:
            new_state = no_remesh(None)
        return new_state, y_hat_t


class Seq2Seq(nn.Module):
    """Full model (ref seq2seq.py:190-527).

    ``__call__(x, y, concat_layers, ...)`` → pixel-space predictions
    (T_out, rows, cols, 1). ``encode``/``decode`` are exposed separately so
    the trainer can re-run the encoder per truncated-BPTT chunk exactly like
    the reference (ref mpnnlstm.py:281-315).
    """

    cfg: ModelConfig
    gcfg: GraphConfig
    transform_func: Optional[Callable] = None
    preset_node_size_base: int = 4  # ref seq2seq.py:291 hard-codes 4
    deterministic: bool = True
    teacher_forcing_ratio: float = 0.0
    use_climatology: bool = False
    # Rematerialisation of scan steps in the backward pass:
    #   True/"full" — replay the whole step (smallest program, ~90 s compile)
    #   "mesh"      — replay compute but SAVE the mesh-build outputs
    #                 (graph/build.py:_tag_mesh): the backward skips the
    #                 sort/dedup/Â-densify whose padded-capacity operand
    #                 prefetches dominate the remeshing decoder's DMA
    #   "dots"      — save matmul outputs, replay elementwise
    #                 (jax.checkpoint_policies.dots_saveable; +5% measured,
    #                 ~2.5x compile)
    #   False/"none" — store everything (+12% measured, ~8x compile)
    remat: Any = True

    def setup(self):
        cfg, gcfg = self.cfg, self.gcfg
        scan_kw = dict(
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True, "sampling": True},
            in_axes=(nn.broadcast, 0),
            out_axes=0,
        )

        def step_cls(cls):
            # Per-step remat keeps rollout memory O(carry) instead of
            # O(T × all conv residuals) — the lax.scan analogue of the
            # reference's truncated-BPTT memory workaround
            if self.remat == "mesh":
                return nn.remat(
                    cls, prevent_cse=False,
                    policy=jax.checkpoint_policies.save_only_these_names(
                        "mesh"
                    ),
                )
            if self.remat == "dots":
                return nn.remat(
                    cls, prevent_cse=False,
                    policy=jax.checkpoint_policies.dots_saveable,
                )
            if self.remat in (False, "none"):
                return cls
            # (ref mpnnlstm.py:281-315; SURVEY.md §7.5 "jax.remat").
            return nn.remat(cls, prevent_cse=False) if self.remat else cls

        if cfg.remesh_input:
            self.enc_scan = nn.scan(step_cls(_EncoderRemeshStep), **scan_kw)(
                cfg, gcfg, self.deterministic, self.transform_func,
                name="enc",
            )
        else:
            self.enc_scan = nn.scan(step_cls(_EncoderScanStep), **scan_kw)(
                cfg, self.deterministic, name="enc"
            )
        self.dec_scan = nn.scan(step_cls(_DecoderScanStep), **scan_kw)(
            cfg,
            gcfg,
            self.deterministic,
            self.teacher_forcing_ratio,
            self.use_climatology,
            self.transform_func,
            name="dec",
        )

    def _zeros_state(self, batch: Optional[int] = None):
        shape = (
            (self.gcfg.n_max, self.cfg.hidden_size)
            if batch is None
            else (self.gcfg.n_max, batch, self.cfg.hidden_size)
        )
        zeros = tuple(
            jnp.zeros(shape, self.cfg.cdtype)
            for _ in range(self.cfg.n_layers)
        )
        return zeros, zeros

    def encode(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        high_interest_region: Optional[jnp.ndarray] = None,
        graph_structure: Optional[GraphTensors] = None,
    ) -> Seq2SeqState:
        """ref seq2seq.py:254-336 (process_inputs).

        ``x`` is (T_in, rows, cols, C) per-sample, or (T_in, B, rows, cols,
        C) for the shared-mesh batched mode: the whole batch rides ONE mesh
        per step (criterion = max over the batch, the batch analogue of the
        builder's timestep-max, ref graph_functions.py:632) and node tensors
        take the batch-middle (n_max, B, F) layout so aggregations widen
        with B instead of multiplying dispatches."""
        cfg, gcfg = self.cfg, self.gcfg
        assert x.shape[0] == cfg.input_timesteps
        batched = x.ndim == 5
        b = x.shape[1] if batched else None
        h0, c0 = self._zeros_state(b)
        # compute_dtype boundary: everything downstream (graph build, node
        # features, recurrence) runs in cfg.compute_dtype; predictions are
        # cast back to f32 in decode().
        x_pe = add_positional_encoding(x.astype(cfg.cdtype))
        _debug_check_finite(
            cfg, x,
            "NaN in graph input x (module=encode; ref "
            "graph_functions.py:626)",
        )
        t_in = cfg.input_timesteps

        def to_batch_middle(data):
            # builder data (T·B, n, C) → time-major batch-middle (T, n, B, C)
            data = data.reshape(t_in, b, gcfg.n_max, -1)
            return jnp.moveaxis(data, 1, 2)

        if cfg.remesh_input and graph_structure is None:
            graph, data = image_to_graph(
                x_pe[0] if batched else x_pe[:1], gcfg, mask=mask,
                high_interest_region=high_interest_region,
                transform_func=self.transform_func,
            )
            x0 = jnp.moveaxis(data, 0, 1) if batched else data[0]
            state = Seq2SeqState(graph=graph, x=x0, hidden=h0, cell=c0)
            # frame t's step remeshes onto frame t+1; the last step keeps its
            # mesh (see module docstring on the reference's off-by-one).
            next_frames = jnp.concatenate([x_pe[1:], x_pe[-1:]], axis=0)
            is_last = jnp.arange(t_in) == t_in - 1
            state, _ = self.enc_scan(
                state, (mask, high_interest_region), (next_frames, is_last)
            )
        else:
            frames = x_pe.reshape((-1,) + x_pe.shape[-3:]) if batched else x_pe
            if graph_structure is not None:
                # Preset mesh: flatten through it and append node sizes
                # (ref seq2seq.py:288-294; size divisor hard-codes the base
                # grid, ref :291).
                graph = graph_structure
                flat = flatten(frames, graph)
                sizes = graph.counts / ((self.preset_node_size_base / 2.0) ** 2)
                sizes = jnp.broadcast_to(
                    sizes[None, :, None], (flat.shape[0], gcfg.n_max, 1)
                )
                data = jnp.concatenate([flat, sizes.astype(flat.dtype)], -1)
            else:
                graph, data = image_to_graph(
                    frames, gcfg, mask=mask,
                    high_interest_region=high_interest_region,
                    transform_func=self.transform_func,
                )
            if batched:
                data = to_batch_middle(data)  # (T, n, B, C+1)
            (hidden, cell), _ = self.enc_scan((h0, c0), graph, data)
            state = Seq2SeqState(
                graph=graph, x=data[-1], hidden=hidden, cell=cell
            )

        # Decoder seed: [value, pos_x, pos_y, node_size] (ref :336).
        n_feats = state.x.shape[-1]
        seed_cols = jnp.asarray([0, n_feats - 3, n_feats - 2, n_feats - 1])
        return state.replace(x=state.x[..., seed_cols])

    def decode(
        self,
        state: Seq2SeqState,
        t0,
        n_steps: int,
        y: Optional[jnp.ndarray] = None,
        concat_layers: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        high_interest_region: Optional[jnp.ndarray] = None,
    ) -> Tuple[Seq2SeqState, jnp.ndarray]:
        """ref seq2seq.py:339-398 (unroll_output). Returns
        (state, y_hat (n_steps, rows, cols, 1)); shared-mesh batched states
        (batch-middle ``state.x``) take time-major batched ``y``/
        ``concat_layers`` (n_steps, B, rows, cols, 1) and return y_hat in
        the same layout."""
        rows, cols = self.gcfg.image_shape
        batched = state.x.ndim == 3
        bshape = (state.x.shape[1],) if batched else ()
        if state.graph.overflow is None:
            # hand-built meshes (e.g. custom graph_structure) may omit the
            # counter; normalise so the scan carry structure is stable when
            # remeshing introduces freshly-built graphs
            state = state.replace(
                graph=state.graph.replace(
                    overflow=jnp.zeros((), jnp.int32)
                )
            )
        ts = t0 + jnp.arange(n_steps)
        clim = (
            concat_layers
            if concat_layers is not None
            else jnp.zeros((n_steps,) + bshape + (rows, cols, 1))
        )
        y_xs = (
            y if y is not None
            else jnp.zeros((n_steps,) + bshape + (rows, cols, 1))
        )

        remeshing = not self.gcfg.pixelwise
        graph_const = state.graph
        if not remeshing:
            # fixed mesh: broadcast it instead of carrying it (cuts the
            # per-iteration mesh DMA), and hoist the per-step climatology
            # flatten out of the scan (one batched flatten over T_out)
            state = state.replace(graph=None)
            if self.use_climatology:
                if batched:
                    t_out = clim.shape[0]
                    flat = flatten(
                        clim.reshape((-1,) + clim.shape[-3:]), graph_const
                    ).reshape(t_out, bshape[0], self.gcfg.n_max, -1)
                    clim = jnp.moveaxis(flat, 1, 2)  # (T, n, B, 1)
                else:
                    clim = flatten(clim, graph_const)
        state, y_hat = self.dec_scan(
            state, (mask, high_interest_region, graph_const), (ts, clim, y_xs)
        )
        if not remeshing:
            state = state.replace(graph=graph_const)
        # predictions leave the compute_dtype region in f32 (loss/metrics)
        return state, y_hat.astype(jnp.float32)

    def __call__(
        self,
        x: jnp.ndarray,
        y: Optional[jnp.ndarray] = None,
        concat_layers: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        high_interest_region: Optional[jnp.ndarray] = None,
        graph_structure: Optional[GraphTensors] = None,
    ) -> jnp.ndarray:
        """Full forward (ref seq2seq.py:402-418) → (T_out, rows, cols, 1)."""
        state = self.encode(
            x,
            mask=mask,
            high_interest_region=high_interest_region,
            graph_structure=graph_structure,
        )
        _, y_hat = self.decode(
            state,
            0,
            self.cfg.output_timesteps,
            y=y,
            concat_layers=concat_layers,
            mask=mask,
            high_interest_region=high_interest_region,
        )
        return y_hat
