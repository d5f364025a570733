"""Test env: force CPU with 8 virtual devices so sharding/collective tests run
without TPU hardware (standard JAX practice, see SURVEY.md §4).

Note: this environment ships an 'axon' TPU plugin that ignores the
JAX_PLATFORMS env var, so we use jax.config (applied before backend init).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled-executable caches between test modules.

    JAX retains every jitted executable (plus its embedded constants) for
    the life of the process; across the full suite that accumulated to an
    OOM kill at 128 GB RSS on this box (round 4). Within a module the
    caches still amortise repeated builds; between modules nothing reuses
    them, so clearing bounds the suite's high-water mark.
    """
    yield
    jax.clear_caches()
