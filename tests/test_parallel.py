"""Multi-device tests on the 8-device virtual CPU mesh: the sharded TGN train
step must compile, run, and agree with the single-device step."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from tempme_tpu.parallel import mesh as M


def test_factorize():
    assert M.factorize(1) == (1, 1, 1)
    assert M.factorize(8) == (2, 2, 2)
    for n in (1, 2, 4, 8):
        dp, sp, tp = M.factorize(n)
        assert dp * sp * tp == n


def test_mesh_axes():
    mesh = M.make_mesh(2, 2, 2)
    assert mesh.shape == {"dp": 2, "sp": 2, "tp": 2}


def test_dryrun_multichip_runs():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_sharded_matches_unsharded():
    """One sharded step == one replicated step (same inputs, dropout off)."""
    import __graft_entry__ as ge
    from tempme_tpu.models.tgn import TGN, init_memory_state
    from tempme_tpu.parallel.train import make_sharded_tgn_train_step
    from tempme_tpu.train import loops
    from tempme_tpu.train.learn_tgn import make_tgn_train_step
    from tempme_tpu.ops import sampler as S

    ev, g, feats = ge._tiny_setup(dn=16, de=8)
    b, n = 8, 4
    model = TGN(node_dim=16, edge_dim=8, num_nodes=g.num_nodes,
                n_layers=2, n_head=2, dropout=0.0)
    mem = init_memory_state(g.num_nodes, model.memory_dim,
                            model.raw_message_dim)
    r = np.random.RandomState(2)
    batch = loops.Batch(
        src=jnp.asarray(r.randint(1, 32, b).astype(np.int32)),
        dst=jnp.asarray(r.randint(1, 32, b).astype(np.int32)),
        ts=jnp.asarray(np.full(b, float(ev.ts.max()) + 1, np.float32)),
        eidx=jnp.asarray(r.randint(1, len(ev), b).astype(np.int32)),
        mask=jnp.ones((b,), bool))
    key = jax.random.PRNGKey(0)
    subs = tuple(S.find_k_hop(g, jax.random.fold_in(key, i), x, batch.ts, 2, n)
                 for i, x in enumerate((batch.src, batch.dst, batch.dst)))
    params = model.init({"params": key, "dropout": key}, feats, mem,
                        batch.src, batch.dst, batch.dst, batch.ts, batch.eidx,
                        *subs, deterministic=True)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    dst_table = jnp.asarray(np.unique(ev.dst))

    # single-device step
    step1 = make_tgn_train_step(model, g, feats, dst_table, n, optimizer)
    state1 = loops.TrainState(params, opt_state, key)
    _, _, aux1 = step1(state1, mem, batch)

    # sharded step over 2x2x2 mesh with identical PRNG stream
    mesh = M.make_mesh(2, 2, 2)
    with mesh:
        step8, place, place_batch = make_sharded_tgn_train_step(
            model, g, feats, dst_table, n, optimizer, mesh)
        p8, o8, m8, k8 = place(params, opt_state, mem, key)
        b8 = place_batch(batch)
        _, _, _, _, loss8 = step8(p8, o8, m8, k8, b8)

    loss1 = float(aux1["loss"])
    # tp-sharded matmuls accumulate partial products via psum in a different
    # order than the replicated step, so bit-exact equality is not expected;
    # agreement to ~1e-2 absolute on an O(1) BCE loss validates the sharding.
    assert abs(loss1 - float(loss8)) < 1e-2, (loss1, float(loss8))
    assert jnp.isfinite(loss8)
