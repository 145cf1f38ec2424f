"""Worker for the 2-process multi-host test (run via subprocess from
test_multihost.py). Each process owns 4 virtual CPU devices; together they
form one 8-device ('dp','sp','tp') mesh and run one edge-partitioned sharded
TGN train step. Prints the loss; the parent asserts both processes agree."""
import os
import sys

proc_id = int(sys.argv[1])
num_procs = int(sys.argv[2])
port = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax  # noqa: E402

# initialize the cluster BEFORE importing the library (any module that
# touches jax.devices at import time would pin a single-process backend);
# this is exactly what multihost.initialize wraps
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=num_procs, process_id=proc_id)

from tempme_tpu.parallel import multihost  # noqa: E402
assert jax.process_count() == num_procs
assert len(jax.devices()) == 4 * num_procs, jax.devices()

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __graft_entry__ as ge  # noqa: E402
from tempme_tpu.models.tgn import TGN, init_memory_state  # noqa: E402
from tempme_tpu.parallel import mesh as M  # noqa: E402
from tempme_tpu.parallel.train import make_sharded_tgn_train_step  # noqa: E402
from tempme_tpu.train import loops  # noqa: E402
from tempme_tpu.ops import sampler as S  # noqa: E402

dn, de, b, n = 16, 8, 8, 4
ev, g, feats = ge._tiny_setup(dn=dn, de=de)
model = TGN(node_dim=dn, edge_dim=de, num_nodes=g.num_nodes,
            n_layers=2, n_head=2, dropout=0.0, compute_dtype=jnp.float32)
mem = init_memory_state(g.num_nodes, model.memory_dim, model.raw_message_dim)

mesh = M.make_mesh(2, 2, 2, devices=jax.devices())

r = np.random.RandomState(2)
# identical host data on every process; the pipeline feeds only local slices
src = r.randint(1, 32, b).astype(np.int32)
dst = r.randint(1, 32, b).astype(np.int32)
ts = np.full(b, float(ev.ts.max()) + 1, np.float32)
eidx = r.randint(1, len(ev), b).astype(np.int32)
events_like = type(ev)(src, dst, ts, np.zeros(b, np.float32), eidx)

key = jax.random.PRNGKey(0)
subs = tuple(S.find_k_hop(g, jax.random.fold_in(key, i), jnp.asarray(x),
                          jnp.asarray(ts), 2, n)
             for i, x in enumerate((src, dst, dst)))
params = model.init({"params": key, "dropout": key}, feats, mem,
                    jnp.asarray(src), jnp.asarray(dst), jnp.asarray(dst),
                    jnp.asarray(ts), jnp.asarray(eidx), *subs,
                    deterministic=True)
optimizer = optax.adam(1e-3)
opt_state = optimizer.init(params)
dst_table = jnp.asarray(np.unique(ev.dst))

with mesh:
    step, place, place_batch = make_sharded_tgn_train_step(
        model, g, feats, dst_table, n, optimizer, mesh)
    params, opt_state, mem, key = place(params, opt_state, mem, key)
    batch = next(multihost.iter_global_batches(
        events_like, b, mesh, shuffle=False, seed=0))
    params, opt_state, mem, key, loss = step(params, opt_state, mem, key,
                                             batch)
    jax.block_until_ready(loss)

multihost.sync_global_devices("done")
print(f"MULTIHOST_OK proc={proc_id} loss={float(loss):.6f}", flush=True)
