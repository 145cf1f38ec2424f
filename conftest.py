"""Root conftest: lock the test session to a CPU backend with 8 virtual
devices (the multi-chip sharding harness, SURVEY.md §4).

The axon sitecustomize may have initialized a TPU backend at interpreter
startup; reconfigure in-process by clearing jax's backend cache before any
test imports jax.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax                                    # noqa: E402
from jax._src import xla_bridge as _xb        # noqa: E402

jax.config.update("jax_platforms", "cpu")
if _xb.backends_are_initialized():
    _xb._clear_backends()
