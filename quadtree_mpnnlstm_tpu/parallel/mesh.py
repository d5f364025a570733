"""Device-mesh helpers.

The reference has no distributed backend at all — scale-out is independent
SLURM array processes (ref submit_ice_test.sh:4-10; SURVEY.md §2.7). The
TPU-native equivalent is a JAX device mesh with XLA collectives over ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None, axis_name: str = "data"
) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (data-parallel axis —
    the one parallelism dimension that matters for this model family, see
    SURVEY.md §2.7)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices).reshape(-1), (axis_name,))
