"""Multi-host (multi-process) SPMD tests.

Launches a real 2-process jax.distributed cluster on localhost (4 virtual CPU
devices per process -> one global 8-device mesh) and runs an
edge-partitioned sharded TGN train step; both processes must produce the
identical global loss. This is the framework's multi-host story
(SURVEY.md §2.10/§5.8 — absent in the reference)."""
import os
import os.path as osp
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cluster_tgn_step():
    port = _free_port()
    root = osp.dirname(osp.dirname(osp.abspath(__file__)))
    worker = osp.join(root, "tests", "multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS", "XLA_FLAGS",
                        "PYTHONPATH")}
    env["PYTHONPATH"] = root
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=root, env=env) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
    losses = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("MULTIHOST_OK")]
        assert lines, out[-2000:]
        losses.append(float(lines[0].split("loss=")[1]))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)


def test_local_slice_partitioning():
    from tempme_tpu.parallel.multihost import local_slice
    sls = [local_slice(64, process_index=i, process_count=4)
           for i in range(4)]
    covered = []
    for sl in sls:
        covered.extend(range(sl.start, sl.stop))
    assert covered == list(range(64))
