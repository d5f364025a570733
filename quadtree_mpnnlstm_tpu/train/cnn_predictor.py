"""Trainer for the dense CNN-LSTM baseline.

Parity target: ref model/cnnlstm.py:253-477 (``NextFramePredictorCNNLSTM``):
same train/predict/save/load surface as the graph predictor, masked loss via
predicate weights (ref :359-364), Adam + StepLR(3, γ), clip 10, teacher
forcing 0.5 during training (ref :355). BatchNorm running statistics live in
a ``batch_stats`` collection updated by the jitted train step.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from quadtree_mpnnlstm_tpu.models.cnnlstm import CNNLSTMSeq2Seq
from quadtree_mpnnlstm_tpu.train import checkpoint as ckpt
from quadtree_mpnnlstm_tpu.train.losses import LOSSES
from quadtree_mpnnlstm_tpu.train.metrics import MetricsLogger
from quadtree_mpnnlstm_tpu.utils.dates import day_of_year
from quadtree_mpnnlstm_tpu.utils.params import get_n_params


class NextFramePredictorCNNLSTM:
    def __init__(
        self,
        image_shape,
        experiment_name: str = "experiment",
        input_features: int = 4,
        hidden_size: int = 32,
        input_timesteps: int = 10,
        output_timesteps: int = 90,
        n_layers: int = 2,
        dropout: float = 0.1,
        kernel_size: int = 3,
        binary: bool = False,
        debug: bool = False,
        device=None,
        use_climatology: bool = False,
        teacher_forcing_ratio: float = 0.5,  # ref :355
        seed: int = 21,
        compute_dtype: str = "float32",
    ):
        self.experiment_name = experiment_name
        self.image_shape = tuple(image_shape)
        self.input_features = input_features
        self.input_timesteps = input_timesteps
        self.output_timesteps = output_timesteps
        self.binary = binary
        self.debug = debug
        self.use_climatology = use_climatology

        common = dict(
            input_features=input_features,
            hidden_size=hidden_size,
            output_features=1,
            input_timesteps=input_timesteps,
            output_timesteps=output_timesteps,
            n_layers=n_layers,
            dropout=dropout,
            kernel_size=kernel_size,
            binary=binary,
            dtype={"float32": None, "bfloat16": jnp.bfloat16}[compute_dtype],
        )
        self.model = CNNLSTMSeq2Seq(
            deterministic=False,
            teacher_forcing_ratio=teacher_forcing_ratio,
            **common,
        )
        self.eval_model = CNNLSTMSeq2Seq(deterministic=True, **common)

        self.rng = jax.random.PRNGKey(seed)
        self.variables = None
        self.opt_state = None
        self.training_initiated = False
        self.train_loss: list = []
        self.test_loss: list = []
        self._steps: Dict[Any, Any] = {}

    # ------------------------------------------------------------------ setup

    def _ensure_params(self):
        if self.variables is not None:
            return
        rows, cols = self.image_shape
        x0 = jnp.zeros((1, self.input_timesteps, rows, cols,
                        self.input_features))
        self.rng, key = jax.random.split(self.rng)
        self.variables = self.eval_model.init({"params": key}, x0)

    def get_n_params(self) -> int:
        self._ensure_params()
        return get_n_params(self.variables["params"])

    def initiate_training(self, lr: float, lr_decay: float):
        from quadtree_mpnnlstm_tpu.utils.compile_cache import (
            enable_persistent_cache,
        )

        enable_persistent_cache()
        self._ensure_params()
        self.loss_func_name = "BCE" if self.binary else "MSE"
        self.loss_func = LOSSES[self.loss_func_name]
        self._base_lr = lr
        self._lr_decay = lr_decay
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(10.0),
            optax.inject_hyperparams(optax.adam)(learning_rate=lr),
        )
        self.opt_state = self.optimizer.init(self.variables["params"])
        self.writer = MetricsLogger(name=self.experiment_name)
        self._epoch = 0
        self.train_loss, self.test_loss = [], []
        self.training_initiated = True

    def _set_lr(self):
        self.opt_state[1].hyperparams["learning_rate"] = jnp.asarray(
            self._base_lr * (self._lr_decay ** (self._epoch // 3))
        )

    # ------------------------------------------------------------------ steps

    def _get_train_step(self):
        if "train" in self._steps:
            return self._steps["train"]
        model, loss_func, optimizer = self.model, self.loss_func, self.optimizer
        use_clim = self.use_climatology

        def train_step(variables, opt_state, x, y, clim, mask, rng):
            params, batch_stats = variables["params"], variables["batch_stats"]

            def loss_fn(params):
                y_hat, updates = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    x, y, clim if use_clim else None, mask,
                    rngs={"dropout": rng, "sampling": rng},
                    mutable=["batch_stats"],
                )
                return loss_fn_masked(y_hat, y, mask), updates

            def loss_fn_masked(y_hat, y, mask):
                w = (~mask.astype(bool)).astype(y.dtype)[None, None, :, :, None]
                num = jnp.sum(((y_hat - y) ** 2) * w) if not self.binary else None
                if self.binary:
                    p = jnp.clip(y_hat, 1e-7, 1 - 1e-7)
                    num = -jnp.sum((y * jnp.log(p) + (1 - y) * jnp.log(1 - p)) * w)
                return num / jnp.sum(jnp.broadcast_to(w, y.shape))

            (loss, updates), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            upd, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, upd)
            variables = {
                "params": params,
                "batch_stats": updates["batch_stats"],
            }
            return variables, opt_state, loss

        step = jax.jit(train_step, donate_argnums=(0, 1))
        self._steps["train"] = step
        return step

    def _get_eval_step(self):
        if "eval" in self._steps:
            return self._steps["eval"]
        model, use_clim = self.eval_model, self.use_climatology
        loss_func = getattr(self, "loss_func", LOSSES["MSE"])

        def eval_step(variables, x, y, clim, mask):
            y_hat = model.apply(
                variables, x, None, clim if use_clim else None, mask
            )
            w = (~mask.astype(bool)).astype(y.dtype)[None, None, :, :, None]
            loss = jnp.sum(((y_hat - y) ** 2) * w) / jnp.sum(
                jnp.broadcast_to(w, y.shape)
            )
            return y_hat, loss

        step = jax.jit(eval_step)
        self._steps["eval"] = step
        return step

    def _clim_batch(self, climatology, launch_dates) -> np.ndarray:
        rows, cols = self.image_shape
        b = len(launch_dates)
        if climatology is None:
            return np.zeros(
                (b, self.output_timesteps, rows, cols, 1), np.float32
            )
        clim = np.asarray(climatology)
        if clim.ndim == 4:
            clim = clim[0]
        out = np.empty((b, self.output_timesteps, rows, cols, 1), np.float32)
        for i, ld in enumerate(np.asarray(launch_dates).reshape(-1)):
            doys = [day_of_year(int(ld), t) for t in range(self.output_timesteps)]
            out[i, ..., 0] = clim[doys]
        return out

    # ------------------------------------------------------------------- train

    def train(
        self,
        loader_train,
        loader_test,
        climatology=None,
        n_epochs: int = 200,
        lr: float = 0.01,
        lr_decay: float = 0.95,
        mask=None,
        high_interest_region=None,
        truncated_backprop: int = 0,
    ):
        if not self.training_initiated:
            self.initiate_training(lr, lr_decay)
        mask_a = (
            jnp.zeros(self.image_shape, bool)
            if mask is None
            else jnp.asarray(mask, bool)
        )
        train_step = self._get_train_step()
        eval_step = self._get_eval_step()

        st = time.time()
        batch_step = 0
        for epoch in range(n_epochs):
            self._set_lr()
            running, steps = 0.0, 0
            # lagged scalar drain (see train/predictor.py): the host-fetch
            # round trip overlaps the next step's device compute
            pending = None
            for x, y, launch in loader_train:
                clim = self._clim_batch(climatology, launch)
                self.rng, key = jax.random.split(self.rng)
                self.variables, self.opt_state, loss = train_step(
                    self.variables, self.opt_state,
                    jnp.asarray(x), jnp.asarray(y), jnp.asarray(clim),
                    mask_a, key,
                )
                if pending is not None:
                    lv = float(pending[0])
                    self.writer.scalar("Loss/train", lv, pending[1])
                    running += lv
                    steps += 1
                pending = (loss, batch_step)
                batch_step += 1
            if pending is not None:
                lv = float(pending[0])
                self.writer.scalar("Loss/train", lv, pending[1])
                running += lv
                steps += 1

            running_test, steps_test = 0.0, 0
            pending_test = None
            for x, y, launch in loader_test:
                clim = self._clim_batch(climatology, launch)
                _, loss = eval_step(
                    self.variables, jnp.asarray(x), jnp.asarray(y),
                    jnp.asarray(clim), mask_a,
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
                raise ValueError("NaN loss :(")
            self.writer.scalar("Loss/test", running_test, epoch)
            self._epoch += 1
            self.train_loss.append(running)
            self.test_loss.append(running_test)
            print(
                f"{self.experiment_name} | Epoch {epoch} train "
                f"{self.loss_func_name}: {running:.4f}, test "
                f"{self.loss_func_name}: {running_test:.4f}, "
                f"time_per_epoch: {(time.time() - st) / (epoch + 1):.1f}"
            )
        print(f"Finished in {(time.time() - st) / 60} minutes")
        self.writer.flush()
        self.loss = {
            "train_loss": list(self.train_loss),
            "test_loss": list(self.test_loss),
        }

    def predict(
        self, loader, climatology=None, mask=None, high_interest_region=None,
        graph_structure=None,
    ) -> np.ndarray:
        self._ensure_params()
        mask_a = (
            jnp.zeros(self.image_shape, bool)
            if mask is None
            else jnp.asarray(mask, bool)
        )
        eval_step = self._get_eval_step()
        outs = []
        for x, _y, launch in loader:
            clim = self._clim_batch(climatology, launch)
            rows, cols = self.image_shape
            y0 = jnp.zeros((x.shape[0], self.output_timesteps, rows, cols, 1))
            y_hat, _ = eval_step(
                self.variables, jnp.asarray(x), y0, jnp.asarray(clim), mask_a
            )
            outs.append(np.asarray(y_hat))
        return np.concatenate(outs, axis=0)

    def score(self, loader, climatology=None, mask=None) -> Dict[str, float]:
        y_hat = self.predict(loader, climatology=climatology, mask=mask)
        y = np.concatenate([y for _, y, _ in loader], axis=0)
        if mask is not None:
            valid = ~np.asarray(mask, bool)
            diff = (y_hat - y)[:, :, valid]
        else:
            diff = y_hat - y
        mse = float(np.mean(diff**2))
        return {"MSE": mse, "RMSE": float(np.sqrt(mse))}

    def save(self, directory: str):
        self._ensure_params()
        ckpt.save_params(self.variables, directory, self.experiment_name)

    def load(self, directory: str):
        self._ensure_params()
        self.variables = ckpt.load_params(
            self.variables, directory, self.experiment_name
        )
