"""Checkpointing.

The reference saves weights only (ref model/mpnnlstm.py:161-168); optimizer
state and epoch are lost across processes. Here:

* ``save_params`` / ``load_params`` — msgpack weight files, the direct
  ``{name}.pth`` equivalent;
* ``save_train_state`` / ``restore_train_state`` — orbax checkpoint of
  params + optimizer state + epoch/step, enabling true resume (SURVEY.md §5
  "TPU equiv: orbax checkpoint of params+opt_state+step").
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

from flax import serialization


def save_params(params, directory: str, name: str) -> str:
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"{name}.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))
    return path


def load_params(template, directory: str, name: str):
    path = os.path.join(directory, f"{name}.msgpack")
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def save_train_state(state: Dict[str, Any], directory: str, name: str) -> str:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, f"{name}_ckpt"))
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, state, force=True)
    ckpt.wait_until_finished()
    return path


def restore_train_state(template: Dict[str, Any], directory: str, name: str):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(directory, f"{name}_ckpt"))
    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(path, template)
