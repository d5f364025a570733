"""Trainer / predictor API (L4).

Parity target: ref model/mpnnlstm.py — ``NextFramePredictor`` ABC (:34-79)
and ``NextFramePredictorS2S`` (:81-443) with ``train / predict / score /
save / load / test_threshold / get_n_params``.

TPU-native redesign:
  * one jitted ``train_step`` does forward + backward + Adam update for a
    whole batch (the reference runs batch_size=1 python loops with a host
    sync per sample, ref :219-322); samples vectorise with ``vmap`` because
    every graph is statically shaped;
  * truncated BPTT re-runs the encoder per chunk exactly like the reference
    (ref :281-315) but wraps each chunk in ``jax.checkpoint`` so the rollout
    is rematerialised instead of ``retain_graph``-ed;
  * LR schedule = Adam + StepLR(step_size=3, gamma=lr_decay) (ref :174-175)
    via an epoch-indexed optax schedule; grad-clip global-norm 10 (ref :251);
  * NaN / divergence guards raise exactly like ref :363-367;
  * mask/HIR normalise to all-false arrays so one compiled executable serves
    masked and unmasked runs.
"""

from __future__ import annotations

import abc
import time

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from quadtree_mpnnlstm_tpu.config import GraphConfig, ModelConfig
from quadtree_mpnnlstm_tpu.data.loader import prefetch_to_device
from quadtree_mpnnlstm_tpu.graph.build import image_to_graph
from quadtree_mpnnlstm_tpu.graph.state import unflatten
from quadtree_mpnnlstm_tpu.models.seq2seq import Seq2Seq
from quadtree_mpnnlstm_tpu.train import checkpoint as ckpt
from quadtree_mpnnlstm_tpu.train.losses import LOSSES
from quadtree_mpnnlstm_tpu.train.metrics import MetricsLogger
from quadtree_mpnnlstm_tpu.utils.dates import day_of_year
from quadtree_mpnnlstm_tpu.utils.params import get_n_params
from quadtree_mpnnlstm_tpu.utils.posenc import add_positional_encoding

NEG_INF = float("-inf")


class NextFramePredictor(abc.ABC):
    """ref model/mpnnlstm.py:34-79."""

    def __init__(
        self,
        thresh: float,
        experiment_name: str = "experiment",
        decompose: bool = True,
        input_features: int = 1,
        transform_func=None,
        condition: str = "max_larger_than",
        device=None,  # accepted for API parity; placement is JAX's job
    ):
        self.experiment_name = experiment_name
        self.thresh = thresh if decompose else NEG_INF
        self.decompose = decompose
        self.transform_func = transform_func
        self.condition = condition
        self.input_features = input_features
        self.device = device
        self.model = None

    @abc.abstractmethod
    def train(self, loader_train, loader_test, **kw):
        ...

    @abc.abstractmethod
    def predict(self, loader, **kw):
        ...

    @abc.abstractmethod
    def score(self, loader, **kw):
        ...


def _as_mask(mask, shape) -> jnp.ndarray:
    if mask is None:
        return jnp.zeros(shape, dtype=bool)
    return jnp.asarray(mask, dtype=bool)




class NextFramePredictorS2S(NextFramePredictor):
    """Seq2Seq trainer (ref model/mpnnlstm.py:81-443)."""

    def __init__(
        self,
        image_shape,
        thresh: float,
        experiment_name: str = "experiment",
        decompose: bool = True,
        input_features: int = 1,
        input_timesteps: int = 3,
        output_timesteps: int = 3,
        device=None,
        transform_func=None,
        condition: str = "max_larger_than",
        remesh_input: bool = False,
        binary: bool = False,
        debug: bool = False,
        use_climatology: bool = False,
        teacher_forcing_ratio: float = 0.0,  # ref train() uses 0 (:237)
        seed: Optional[int] = None,  # default 21 (ref ice_exp.py:29-31)
        model_kwargs: Optional[Dict[str, Any]] = None,
        graph_kwargs: Optional[Dict[str, Any]] = None,
        dp_devices: int = 1,
        train_config=None,
        shared_mesh: Optional[bool] = None,
    ):
        super().__init__(
            thresh=thresh,
            experiment_name=experiment_name,
            decompose=decompose,
            input_features=input_features,
            transform_func=transform_func,
            condition=condition,
            device=device,
        )
        self.thresh = thresh if decompose else NEG_INF
        self.binary = binary
        self.debug = debug
        self.input_timesteps = input_timesteps
        self.output_timesteps = output_timesteps
        self.use_climatology = use_climatology

        # Optional TrainConfig: supplies optimisation defaults for train()
        # and the model compute dtype (TrainConfig.dtype → compute_dtype).
        # Seed resolution: explicit seed > train_config.seed > 21 — an
        # explicitly passed seed always wins, even seed=21 (advisor round-3:
        # the old `seed == 21` sentinel silently overrode it).
        self.train_config = train_config
        if seed is None:
            seed = train_config.seed if train_config is not None else 21
        # Shared-mesh batched training (TrainConfig.shared_mesh): explicit
        # kwarg > train_config > off. Training only — eval/predict keep
        # per-sample meshes so metrics stay reference-comparable.
        if shared_mesh is None:
            shared_mesh = bool(
                getattr(train_config, "shared_mesh", False)
            ) if train_config is not None else False
        self.shared_mesh = shared_mesh

        mk = dict(model_kwargs or {})
        self.cfg = ModelConfig(
            hidden_size=mk.pop("hidden_size", 32),
            dropout=mk.pop("dropout", 0.1),
            input_features=input_features,
            input_timesteps=input_timesteps,
            output_timesteps=output_timesteps,
            n_layers=mk.pop("n_layers", 4),
            n_conv_layers=mk.pop("n_conv_layers", 2),
            convolution_type=mk.pop("convolution_type", "ChebConv"),
            rnn_type=mk.pop("rnn_type", "LSTM"),
            binary=binary,
            dummy=mk.pop("dummy", False),
            remesh_input=remesh_input,
            remesh_every=mk.pop("remesh_every", 1),
            fused_gates=mk.pop("fused_gates", True),
            # debug=True turns on NaN localization inside the scan bodies
            # (checkify; the debug train step functionalizes the checks)
            debug_nan=mk.pop("debug_nan", debug),
            compute_dtype=mk.pop(
                "compute_dtype",
                train_config.dtype if train_config is not None else "float32",
            ),
        )
        remat = mk.pop("remat", True)
        assert not mk, f"unknown model_kwargs: {sorted(mk)}"

        gk = dict(graph_kwargs or {})
        carry_edges_explicit = "carry_edges" in gk
        self.gcfg = GraphConfig(
            image_shape=tuple(image_shape),
            # ref image_to_graph default base grid (graph_functions.py:590)
            max_grid_size=gk.pop("max_grid_size", 64),
            thresh=self.thresh,
            condition=condition,
            use_edge_attrs=self.cfg.uses_edge_attrs,
            **gk,
        )
        if (
            self.gcfg.aggregation == "grid"
            and self.cfg.convolution_type in ("GATConv", "GATv2Conv")
        ):
            # GAT needs an edge-list mesh (self-loop insertion); falling
            # back here gives a reference pixelwise GAT experiment a
            # working backend instead of a ValueError from inside jit
            # (models/conv.py raises; same fallback as test_threshold)
            print(
                f"{self.cfg.convolution_type} is unsupported on the dense "
                "grid stencil backend; falling back to aggregation='xla'"
            )
            self.gcfg = self.gcfg.replace(aggregation="xla")
        if (
            self.gcfg.aggregation == "pallas"
            and self.cfg.convolution_type
            in ("TransformerConv", "MHTransformerConv")
        ):
            # attention convs ride the fused attention windows
            # (ops/pallas_attn.py), not the GCN/Cheb Â blocks
            self.gcfg = self.gcfg.replace(attn_windows=True)
        if (
            not carry_edges_explicit
            and self.gcfg.aggregation == "pallas"
            and self.gcfg.max_degree == 0
            and self.cfg.convolution_type
            in ("GCNConv", "ChebConv", "TransformerConv", "MHTransformerConv")
        ):
            # aggregation rides the Â blocks / attention windows; the edge
            # list is dead weight in the remeshing scan carry
            # (GraphConfig.carry_edges)
            self.gcfg = self.gcfg.replace(carry_edges=False)

        common = dict(
            # debug_nan checks are trace-invalid outside checkify, so the
            # train/eval models never carry them; only the dedicated
            # debug_model below does (used for the checkified forward
            # replay in the debug train step).
            cfg=self.cfg.replace(debug_nan=False),
            gcfg=self.gcfg,
            transform_func=transform_func,
            use_climatology=use_climatology,
            # Per-step remat keeps rollout memory O(carry); turning it off
            # removes the backward's forward replay (+12% measured on v5e)
            # at the cost of a much larger XLA program (~10x compile time).
            remat=remat,
        )
        self.model = Seq2Seq(
            deterministic=False,
            teacher_forcing_ratio=teacher_forcing_ratio,
            **common,
        )
        self.eval_model = Seq2Seq(deterministic=True, **common)
        self.debug_model = None
        if self.cfg.debug_nan:
            self.debug_model = Seq2Seq(
                deterministic=False,
                teacher_forcing_ratio=teacher_forcing_ratio,
                **dict(common, cfg=self.cfg),
            )

        # Data-parallel training over the first ``dp_devices`` devices
        # (gradient pmean over ICI; new capability vs the reference's
        # single-device batch-1 loop, SURVEY.md §2.7). 1 = single device.
        self.dp_devices = int(dp_devices)
        assert self.dp_devices >= 1
        if self.dp_devices > 1:
            assert self.dp_devices <= jax.device_count(), (
                f"dp_devices={dp_devices} > available {jax.device_count()}"
            )

        self.rng = jax.random.PRNGKey(seed)
        self.params = None
        self.opt_state = None
        self.training_initiated = False
        self.train_loss: list = []
        self.test_loss: list = []
        self.loss = None  # populated after train() like ref :383-387
        self._steps: Dict[Any, Any] = {}

    # ------------------------------------------------------------------ init

    def _ensure_params(self):
        if self.params is not None:
            return
        rows, cols = self.gcfg.image_shape
        x0 = jnp.zeros(
            (self.input_timesteps, rows, cols, self.input_features)
        )
        self.rng, key = jax.random.split(self.rng)
        self.params = self.eval_model.init(
            {"params": key},
            x0,
            mask=_as_mask(None, (rows, cols)),
            high_interest_region=_as_mask(None, (rows, cols)),
        )

    def get_n_params(self) -> int:
        self._ensure_params()
        return get_n_params(self.params)

    # ---------------------------------------------------------------- training

    def initiate_training(self, lr: float, lr_decay: float):
        """ref mpnnlstm.py:170-184 (Adam, StepLR(3, γ), loss fn, writer)."""
        from quadtree_mpnnlstm_tpu.utils.compile_cache import (
            enable_persistent_cache,
        )

        enable_persistent_cache()  # amortise the scan-program compiles
        self._ensure_params()
        self.loss_func_name = "BCE" if self.binary else "MSE"
        self.loss_func = LOSSES[self.loss_func_name]
        self._base_lr = lr
        self._lr_decay = lr_decay
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(10.0),  # ref :251
            optax.inject_hyperparams(optax.adam)(learning_rate=lr),
        )
        self.opt_state = self.optimizer.init(self.params)
        self.writer = MetricsLogger(name=self.experiment_name)
        self.train_loss = []
        self.test_loss = []
        self._epoch = 0
        self.training_initiated = True

    def _current_lr(self) -> float:
        # StepLR: lr * γ^(epoch // 3) (ref :175)
        return self._base_lr * (self._lr_decay ** (self._epoch // 3))

    def _set_lr(self):
        self.opt_state[1].hyperparams["learning_rate"] = jnp.asarray(
            self._current_lr()
        )

    # -- jitted steps (cached per static configuration) ---------------------

    def _chunks(self, truncated_backprop: int):
        t = self.output_timesteps
        if truncated_backprop <= 0 or truncated_backprop >= t:
            return [(0, t)]
        out, t0 = [], 0
        while t0 < t:
            out.append((t0, min(truncated_backprop, t - t0)))
            t0 += out[-1][1]
        return out

    def _get_train_step(self, has_graph_structure: bool, truncated: int):
        key = ("train", has_graph_structure, truncated)
        if key in self._steps:
            return self._steps[key]

        model = self.model
        loss_func = self.loss_func
        chunks = self._chunks(truncated)
        optimizer = self.optimizer

        def _graph_overflow(state):
            # rollout-max capacity-overflow counter accumulated through the
            # scan carry (seq2seq do_remesh); None for hand-built meshes
            ovf = state.graph.overflow
            if ovf is None:
                return jnp.zeros((), jnp.int32)
            return jax.lax.stop_gradient(ovf)

        def make_sample_loss(model):
            def sample_loss(params, x, y, clim, mask, hir, gs, rng):
                # mixed precision needs no param handling here: the model's
                # layers carry ModelConfig.compute_dtype and cast the f32
                # master params at use (grads come back f32).
                # Returns (loss, rollout-max mesh-capacity overflow).
                rngs = {"dropout": rng[0], "sampling": rng[1]}
                clim_arg = clim if self.use_climatology else None
                if len(chunks) == 1:
                    state = model.apply(
                        params, x,
                        mask=mask, high_interest_region=hir,
                        graph_structure=gs,
                        rngs=rngs, method=Seq2Seq.encode,
                    )
                    state, y_hat = model.apply(
                        params, state, 0, self.output_timesteps, y, clim_arg,
                        mask, hir, rngs=rngs, method=Seq2Seq.decode,
                    )
                    return loss_func(y_hat, y, mask), _graph_overflow(state)
                # Truncated BPTT: re-encode per chunk (ref
                # mpnnlstm.py:281-315), rematerialise each chunk's rollout;
                # loss = Σ chunk means (the reference's per-chunk backward
                # accumulates exactly this grad).
                total = 0.0
                ovf = jnp.zeros((), jnp.int32)
                for t0, n in chunks:
                    state = model.apply(
                        params, x,
                        mask=mask, high_interest_region=hir,
                        graph_structure=gs,
                        rngs=rngs, method=Seq2Seq.encode,
                    )

                    def chunk_fn(p, s, yc, cc, t0=t0, n=n):
                        s, y_hat = model.apply(
                            p, s, t0, n, yc,
                            cc if self.use_climatology else None,
                            mask, hir,
                            rngs=rngs, method=Seq2Seq.decode,
                        )
                        return y_hat, _graph_overflow(s)

                    y_c = jax.lax.dynamic_slice_in_dim(y, t0, n, axis=0)
                    c_c = jax.lax.dynamic_slice_in_dim(clim, t0, n, axis=0)
                    y_hat, chunk_ovf = jax.checkpoint(chunk_fn)(
                        params, state, y_c, c_c
                    )
                    ovf = jnp.maximum(ovf, chunk_ovf)
                    total = total + loss_func(y_hat, y_c, mask)
                return total, ovf

            return sample_loss

        sample_loss = make_sample_loss(model)
        shared_mesh = self.shared_mesh

        def make_batch_loss(sample_loss):
            """(params, x(B,T,...), y, clim, keys(B,2,2), ...) → (loss, ovf).

            Default: vmap over per-sample meshes. shared_mesh: ONE call on
            time-major batched arrays — the whole batch rides one mesh per
            step in the batch-middle node layout (TrainConfig.shared_mesh;
            models/seq2seq.py batched paths), so the mesh build amortises
            over B and aggregations widen instead of re-dispatching.
            """

            def batch_loss(params, x, y, clim, keys, mask, hir, gs):
                if shared_mesh:
                    return sample_loss(
                        params,
                        jnp.moveaxis(x, 0, 1), jnp.moveaxis(y, 0, 1),
                        jnp.moveaxis(clim, 0, 1),
                        mask, hir, gs, keys[0],
                    )
                losses, ovfs = jax.vmap(
                    lambda xb, yb, cb, kb: sample_loss(
                        params, xb, yb, cb, mask, hir, gs, kb
                    )
                )(x, y, clim, keys)
                return jnp.mean(losses), jnp.max(ovfs)

            return batch_loss

        batch_loss_fn = make_batch_loss(sample_loss)

        debug = self.debug
        dp = self.dp_devices

        if dp > 1:
            from jax.sharding import PartitionSpec as P
            from jax import shard_map

            from quadtree_mpnnlstm_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(dp)

            def device_fn(params, x, y, clim, keys, mask, hir, gs):
                def local_loss(params):
                    # per-shard batch: vmapped per-sample meshes, or one
                    # shared mesh per shard (shared_mesh)
                    return batch_loss_fn(params, x, y, clim, keys,
                                         mask, hir, gs)

                (loss, ovf), grads = jax.value_and_grad(
                    local_loss, has_aux=True
                )(params)
                # Equal shard sizes ⇒ pmean of shard means = global mean.
                return (
                    jax.lax.pmean(loss, "data"),
                    jax.lax.pmean(grads, "data"),
                    jax.lax.pmax(ovf, "data"),
                )

            sharded = shard_map(
                device_fn,
                mesh=mesh,
                in_specs=(P(), P("data"), P("data"), P("data"), P("data"),
                          P(), P(), P()),
                out_specs=(P(), P(), P()),
                check_vma=False,
            )

        def train_step(params, opt_state, x, y, clim, mask, hir, gs, rng):
            keys = jax.random.split(rng, x.shape[0] * 2).reshape(
                x.shape[0], 2, 2
            )

            if dp > 1:
                loss, grads, ovf = sharded(
                    params, x, y, clim, keys, mask, hir, gs
                )
            else:
                def batch_loss(params):
                    return batch_loss_fn(params, x, y, clim, keys,
                                         mask, hir, gs)

                (loss, ovf), grads = jax.value_and_grad(
                    batch_loss, has_aux=True
                )(params)
            aux = {"mesh_overflow": ovf}
            if debug:
                # encoder/decoder gradient norms (ref mpnnlstm.py:272-276)
                def tree_norm(t):
                    leaves = jax.tree_util.tree_leaves(t)
                    if not leaves:
                        return jnp.zeros(())
                    return jnp.sqrt(
                        sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in leaves)
                    )

                p = grads["params"]
                aux["enc_grad_norm"] = tree_norm(p.get("enc", {}))
                aux["dec_grad_norm"] = tree_norm(p.get("dec", {}))
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, aux

        if debug:
            # NaN localization (ModelConfig.debug_nan): checkify user-checks
            # inside a lax.scan body are silently discharged by jax.grad
            # (verified by bisection: grad+scan and grad+remat+scan drop
            # them; forward-only scan/remat keep them). So the grad step
            # runs unchecked, and when its loss comes back non-finite we
            # REPLAY the forward alone under checkify — same params, same
            # rng — which raises naming the module and rollout step that
            # first went non-finite, instead of the reference's epoch-end
            # "NaN loss :(" (ref mpnnlstm.py:363-364). Zero overhead until
            # something actually breaks; no donation so params survive for
            # the replay.
            from jax.experimental import checkify

            debug_batch_loss = make_batch_loss(
                make_sample_loss(self.debug_model)
            )

            def fwd_loss(params, x, y, clim, keys, mask, hir, gs):
                loss, _ = debug_batch_loss(
                    params, x, y, clim, keys, mask, hir, gs
                )
                return loss

            checked_fwd = jax.jit(
                checkify.checkify(fwd_loss, errors=checkify.user_checks)
            )
            plain = jax.jit(train_step)

            def step(params, opt_state, x, y, clim, mask, hir, gs, rng):
                out = plain(
                    params, opt_state, x, y, clim, mask, hir, gs, rng
                )
                if not np.isfinite(float(out[2])):
                    # Replay per DP shard so the checked forward sees the
                    # same batch partitioning as the training step: under
                    # shard_map each shard runs batch_loss_fn on its own
                    # contiguous slice of (x, keys, …), and with shared_mesh
                    # the mesh/rng are per-shard (keys[shard_start]) — a
                    # single global replay would use a different mesh and
                    # rng and could miss the NaN entirely.
                    keys = jax.random.split(rng, x.shape[0] * 2).reshape(
                        x.shape[0], 2, 2
                    )
                    n_shards = dp if dp > 1 else 1
                    per = x.shape[0] // n_shards
                    for i in range(n_shards):
                        sl = slice(i * per, (i + 1) * per)
                        err, _ = checked_fwd(
                            params, x[sl], y[sl], clim[sl], keys[sl],
                            mask, hir, gs
                        )
                        err.throw()  # names failing module / rollout step
                    raise ValueError(
                        "non-finite loss but all forward checks passed "
                        f"across {n_shards} shard replay(s) — the NaN "
                        "arose in the backward pass or the optimizer "
                        "update"
                    )
                return out
        else:
            step = jax.jit(train_step, donate_argnums=(0, 1))
        self._steps[key] = step
        return step

    def _get_eval_step(self, has_graph_structure: bool):
        key = ("eval", has_graph_structure)
        if key in self._steps:
            return self._steps[key]
        model = self.eval_model
        loss_func = getattr(self, "loss_func", LOSSES["MSE"])

        def fwd(params, x, clim, mask, hir, gs):
            clim_arg = clim if self.use_climatology else None
            return model.apply(
                params, x, None, clim_arg,
                mask=mask, high_interest_region=hir, graph_structure=gs,
            )

        def eval_step(params, x, y, clim, mask, hir, gs):
            y_hat = jax.vmap(
                lambda xb, cb: fwd(params, xb, cb, mask, hir, gs)
            )(x, clim)
            loss = loss_func(y_hat, y, mask)
            return y_hat, loss

        step = jax.jit(eval_step)
        self._steps[key] = step
        return step

    def _drain_step_metrics(self, pending, running, epoch_overflow):
        """Fetch + log one train step's device scalars.

        Called one step late (see the train loop) so the host-fetch round
        trip overlaps the next step's device compute."""
        loss_d, aux, step_idx = pending
        loss = float(loss_d)
        self.writer.scalar("Loss/train", loss, step_idx)
        epoch_overflow = max(
            epoch_overflow, int(aux.get("mesh_overflow", 0))
        )
        if "enc_grad_norm" in aux:  # debug (ref mpnnlstm.py:272-276)
            self.writer.scalar(
                "Grad/encoder/grad_norms",
                float(aux["enc_grad_norm"]), step_idx,
            )
            self.writer.scalar(
                "Grad/decoder/grad_norms",
                float(aux["dec_grad_norm"]), step_idx,
            )
        return running + loss, epoch_overflow

    def _clim_batch(self, climatology, launch_dates) -> np.ndarray:
        """(B, T_out, rows, cols, 1) day-of-year normals
        (ref mpnnlstm.py:389-400)."""
        rows, cols = self.gcfg.image_shape
        b = len(launch_dates)
        if climatology is None:
            return np.zeros((b, self.output_timesteps, rows, cols, 1), np.float32)
        clim = np.asarray(climatology)
        if clim.ndim == 4:  # (1, 365, rows, cols)
            clim = clim[0]
        out = np.empty((b, self.output_timesteps, rows, cols, 1), np.float32)
        for i, ld in enumerate(np.asarray(launch_dates).reshape(-1)):
            doys = [
                day_of_year(int(ld), t) for t in range(self.output_timesteps)
            ]
            out[i, ..., 0] = clim[doys]
        return out

    def train(
        self,
        loader_train,
        loader_test,
        climatology=None,
        n_epochs: Optional[int] = None,
        lr: Optional[float] = None,
        lr_decay: Optional[float] = None,
        mask=None,
        high_interest_region=None,
        truncated_backprop: Optional[int] = None,
        graph_structure=None,
        divergence_threshold: float = 4.0,
    ):
        """ref model/mpnnlstm.py:187-387. Optimisation arguments default to
        the constructor's ``train_config`` when one was passed (else the
        reference's literals). ``divergence_threshold`` is the reference's
        abort-when-test-loss-exceeds guard (ref :366-367, literal 4); long
        rollouts evaluated after very short smoke epochs can trip it
        spuriously — raise it for such runs."""
        tc = self.train_config
        if n_epochs is None:
            n_epochs = tc.n_epochs if tc is not None else 200
        if lr is None:
            lr = tc.lr if tc is not None else 0.01
        if lr_decay is None:
            lr_decay = tc.lr_decay if tc is not None else 0.95
        if truncated_backprop is None:
            truncated_backprop = tc.truncated_backprop if tc is not None else 0
        image_shape = self.gcfg.image_shape
        if mask is not None:
            assert tuple(np.asarray(mask).shape) == tuple(image_shape), (
                f"Mask and image shapes do not match. Got "
                f"{np.asarray(mask).shape} and {image_shape}"
            )
        if not self.training_initiated:
            self.initiate_training(lr, lr_decay)

        mask_a = _as_mask(mask, image_shape)
        hir_a = _as_mask(high_interest_region, image_shape)
        has_gs = graph_structure is not None
        train_step = self._get_train_step(has_gs, truncated_backprop)
        eval_step = self._get_eval_step(has_gs)

        st = time.time()
        batch_step = 0
        for epoch in range(n_epochs):
            self._set_lr()
            running, steps = 0.0, 0
            epoch_overflow = 0
            # Per-step scalars (loss, overflow) are fetched one step LATE:
            # on the tunneled platform every host fetch is a full round
            # trip (~30 ms at ice scale), and draining the previous step's
            # metrics after launching the current step overlaps that round
            # trip with device compute (PERF_NOTES round 3). Inputs are
            # already overlapped by prefetch_to_device; loss values and
            # epoch aggregates are unchanged.
            pending = None
            for x, y, launch in prefetch_to_device(loader_train):
                if self.dp_devices > 1 and x.shape[0] % self.dp_devices:
                    raise ValueError(
                        f"global batch {x.shape[0]} not divisible by "
                        f"dp_devices={self.dp_devices} (use drop_last=True)"
                    )
                clim = self._clim_batch(climatology, launch)
                self.rng, key = jax.random.split(self.rng)
                self.params, self.opt_state, loss, aux = train_step(
                    self.params, self.opt_state,
                    jnp.asarray(x), jnp.asarray(y), jnp.asarray(clim),
                    mask_a, hir_a, graph_structure, key,
                )
                if pending is not None:
                    running, epoch_overflow = self._drain_step_metrics(
                        pending, running, epoch_overflow
                    )
                    steps += 1
                pending = (loss, aux, batch_step)
                batch_step += 1
            if pending is not None:
                running, epoch_overflow = self._drain_step_metrics(
                    pending, running, epoch_overflow
                )
                steps += 1

            running_test, steps_test = 0.0, 0
            pending_test = None
            for x, y, launch in prefetch_to_device(loader_test):
                clim = self._clim_batch(climatology, launch)
                _, loss = eval_step(
                    self.params, jnp.asarray(x), jnp.asarray(y),
                    jnp.asarray(clim), mask_a, hir_a, graph_structure,
                )
                if pending_test is not None:
                    running_test += float(pending_test)
                    steps_test += 1
                pending_test = loss
            if pending_test is not None:
                running_test += float(pending_test)
                steps_test += 1

            running /= max(steps, 1)
            running_test /= max(steps_test, 1)

            if np.isnan(running_test):
                raise ValueError("NaN loss :(")  # ref :363-364
            if running_test > divergence_threshold:
                raise ValueError("Diverged :(")  # ref :366-367

            self.writer.scalar("Loss/test", running_test, epoch)
            # rollout-max capacity overflow: >0 means the mesh dropped
            # nodes/edges/window slots — raise n_max/e_max/agg_* caps
            self.writer.scalar("Mesh/overflow_max", epoch_overflow, epoch)
            if epoch_overflow > 0:
                print(
                    f"WARNING: mesh capacity overflow ({epoch_overflow} "
                    "dropped slots at the worst step) — raise "
                    "n_max/e_max/agg_* (GraphConfig)"
                )
            self._epoch += 1
            self.train_loss.append(running)
            self.test_loss.append(running_test)
            print(
                f"{self.experiment_name} | Epoch {epoch} train "
                f"{self.loss_func_name}: {running:.4f}, test "
                f"{self.loss_func_name}: {running_test:.4f}, "
                f"lr: {self._current_lr():.4f}, "
                f"time_per_epoch: {(time.time() - st) / (epoch + 1):.1f}"
            )

        print(f"Finished in {(time.time() - st) / 60} minutes")
        self.writer.flush()
        self.loss = {
            "train_loss": list(self.train_loss),
            "test_loss": list(self.test_loss),
        }

    # ---------------------------------------------------------------- predict

    def predict(
        self,
        loader,
        climatology=None,
        mask=None,
        high_interest_region=None,
        graph_structure=None,
    ) -> np.ndarray:
        """ref mpnnlstm.py:402-440 → (N, T_out, rows, cols, 1)."""
        self._ensure_params()
        image_shape = self.gcfg.image_shape
        mask_a = _as_mask(mask, image_shape)
        hir_a = _as_mask(high_interest_region, image_shape)
        eval_step = self._get_eval_step(graph_structure is not None)
        outs = []
        for x, _y, launch in loader:
            clim = self._clim_batch(climatology, launch)
            y_hat, _ = eval_step(
                self.params, jnp.asarray(x),
                jnp.zeros((x.shape[0], self.output_timesteps, *image_shape, 1)),
                jnp.asarray(clim), mask_a, hir_a, graph_structure,
            )
            outs.append(np.asarray(y_hat))
        return np.concatenate(outs, axis=0)

    def score(self, loader, climatology=None, mask=None, **kw) -> Dict[str, float]:
        """Masked MSE/RMSE over a loader (the reference leaves score()
        unimplemented, ref mpnnlstm.py:442-443)."""
        y_hat = self.predict(loader, climatology=climatology, mask=mask, **kw)
        y = np.concatenate([y for _, y, _ in loader], axis=0)
        if mask is not None:
            valid = ~np.asarray(mask, bool)
            diff = (y_hat - y)[:, :, valid]
        else:
            diff = y_hat - y
        mse = float(np.mean(diff**2))
        return {"MSE": mse, "RMSE": float(np.sqrt(mse))}

    # ------------------------------------------------------------ persistence

    def save(self, directory: str):
        """Weights-only save, ref mpnnlstm.py:161-162."""
        self._ensure_params()
        ckpt.save_params(self.params, directory, self.experiment_name)

    def load(self, directory: str):
        self._ensure_params()
        self.params = ckpt.load_params(
            self.params, directory, self.experiment_name
        )

    def save_checkpoint(self, directory: str):
        """Full resume state (params+opt+epoch) — beyond-reference."""
        ckpt.save_train_state(
            {
                "params": self.params,
                "opt_state": self.opt_state,
                "epoch": self._epoch,
            },
            directory,
            self.experiment_name,
        )

    def restore_checkpoint(self, directory: str, lr=0.01, lr_decay=0.95):
        if not self.training_initiated:
            self.initiate_training(lr, lr_decay)
        state = ckpt.restore_train_state(
            {
                "params": self.params,
                "opt_state": self.opt_state,
                "epoch": self._epoch,
            },
            directory,
            self.experiment_name,
        )
        self.params = state["params"]
        self.opt_state = state["opt_state"]
        self._epoch = int(state["epoch"])

    # ------------------------------------------------------------ diagnostics

    def test_threshold(
        self, x, thresh, mask=None, high_interest_region=None, contours=True
    ):
        """Mesh visualiser (ref mpnnlstm.py:138-156): reconstruct the image
        through a graph built at ``thresh``; returns (fig, axes) if
        matplotlib is available else (reconstruction, labels)."""
        x = jnp.asarray(x)
        n_sample = x.shape[0]
        shape = self.gcfg.image_shape
        kw = dict(thresh=float(thresh))
        if self.gcfg.aggregation == "grid" and float(thresh) != NEG_INF:
            # the visualiser sweeps quadtree thresholds; the grid backend
            # only exists for pixelwise meshes, so fall back to edge lists
            kw.update(aggregation="xla", attn_windows=False)
        gcfg = self.gcfg.replace(**kw)
        xp = add_positional_encoding(x)
        graph, data = image_to_graph(
            xp, gcfg,
            mask=None if mask is None else jnp.asarray(mask),
            high_interest_region=None
            if high_interest_region is None
            else jnp.asarray(high_interest_region),
            transform_func=self.transform_func,
        )
        recon = np.asarray(unflatten(data[..., :1], graph, shape))
        labels = np.asarray(graph.pixel_node).reshape(shape)
        labels = np.where(labels >= gcfg.n_max, -1, labels)
        num_nodes = int(graph.n_nodes)
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            from quadtree_mpnnlstm_tpu.eval.plotting import plot_contours

            fig, axs = plt.subplots(
                1, n_sample, figsize=(5 * n_sample, 4), squeeze=False
            )
            axs = axs[0]
            for i in range(n_sample):
                axs[i].imshow(recon[i, ..., 0])
                if contours:
                    plot_contours(axs[i], labels)
            fig.suptitle(f"Threshold: {thresh} | Num. nodes: {num_nodes}")
            return fig, axs
        except ImportError:
            return recon, labels
