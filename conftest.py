"""Root conftest: lock the test session to a CPU backend with 8 virtual
devices (the multi-chip sharding harness, SURVEY.md §4).

The axon sitecustomize may have initialized a TPU backend at interpreter
startup; tempme_tpu.utils.devices.ensure_virtual_devices is the one guarded
home for the in-process reconfiguration (it only imports tempme_tpu.config,
which never touches jax backends).
"""
from tempme_tpu.utils.devices import ensure_virtual_devices

ensure_virtual_devices(8)
