"""Dynamic load balancing gates (GfsEventBalance, src/balance.c).

8 virtual CPU devices (conftest).  The TPU-native balancer re-partitions
the Morton block axis so active blocks spread evenly, and re-shards the
block tables — data integrity and balance quality are both gated.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gerris_tpu.parallel import balance


def _skewed_active(nb=16):
    """All active blocks clustered in the first Morton quarter (the
    worst case for a uniform static split)."""
    act = np.zeros(nb * nb, bool)
    act[: nb * nb // 4] = True
    return act


def test_balanced_split_equalizes_active_counts():
    act = _skewed_active()
    n_dev = 8
    uniform = np.asarray([(act.size * d) // n_dev
                          for d in range(n_dev + 1)])
    c0 = balance.device_costs(act, uniform)
    assert c0.max() - c0.min() == act.sum() // 2  # grossly imbalanced
    split = balance.balanced_split(act, n_dev)
    c1 = balance.device_costs(act, split)
    assert c1.sum() == act.sum()
    assert c1.max() - c1.min() <= 1, c1            # near-perfect
    assert balance.imbalance(act, split) <= 1.2


def test_balanced_split_edge_cases():
    n_dev = 8
    # no active blocks: falls back to uniform chunks
    split = balance.balanced_split(np.zeros(64, bool), n_dev)
    assert split[0] == 0 and split[-1] == 64
    assert np.all(np.diff(split) >= 0)
    # fewer active blocks than devices
    act = np.zeros(64, bool)
    act[[3, 40]] = True
    split = balance.balanced_split(act, n_dev)
    c = balance.device_costs(act, split)
    assert c.sum() == 2 and c.max() <= 1


def test_reshard_preserves_block_data():
    """Re-sharding is a pure permutation of whole blocks: any per-block
    computation commutes with it (the migration-correctness property of
    gfs_send_boxes; here it is a gather under NamedSharding)."""
    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 virtual devices")
    mesh = balance.block_mesh(8)
    act = _skewed_active(nb=8)                    # 64 blocks
    B = 4
    rng = np.random.default_rng(0)
    blocks = jnp.asarray(rng.normal(size=(64, B, B)))

    idx, valid, split = balance.pack_assignment(act, 8)
    out = balance.reshard(blocks, idx, mesh)
    # per-device chunk sizes are even (padded) and the sharding took
    assert out.shape[0] % 8 == 0
    assert len(out.sharding.device_set) == 8
    # active-block sums are preserved exactly (padding masked out)
    f = lambda b: jnp.sum(b ** 2, axis=(1, 2))    # any per-block kernel
    before = float(jnp.sum(jnp.where(jnp.asarray(act), f(blocks), 0.0)))
    act_packed = np.asarray(act)[idx] & valid
    after = float(jnp.sum(jnp.where(jnp.asarray(act_packed), f(out), 0.0)))
    assert np.isclose(before, after, rtol=0, atol=1e-12)
    # and each active block's data is bit-identical after migration
    got = np.asarray(out)[valid]
    want = np.asarray(blocks)[idx[valid]]
    assert np.array_equal(got, want)


def test_event_balance_triggers_and_converges():
    """EventBalance fires on imbalance, records the new split, and a
    second firing is a no-op (balanced state is under the threshold) —
    the do-while convergence of gfs_event_balance_event."""
    class SimStub:
        pass

    sim = SimStub()
    nb, B = 16, 8
    depth = np.zeros((nb * B, nb * B), np.int32)
    depth[: nb * B // 2, : nb * B // 2] = 3       # refined quadrant
    sim.depth = depth
    sim.block_B = B

    ev = balance.EventBalance(istep=1, max_ratio=1.1, n_devices=8)
    ev.fire(sim, t=0.0, i=0)
    assert ev.rebalanced == 1
    assert hasattr(sim, "block_split")
    act = ev._active_mask(sim)
    c = balance.device_costs(act, sim.block_split)
    assert c.max() - c.min() <= 1
    # balanced now: firing again must not re-partition
    ev.fire(sim, t=0.0, i=1)
    assert ev.rebalanced == 1


def test_gfs_event_balance_parses():
    """`EventBalance { istep = 10 } 1.2` wires into the event list
    (event_balance_read, src/balance.c:262-297)."""
    from gerris_tpu.utils import gfs_config as gc
    gfs = """
1 0 GfsSimulation GfsBox GfsGEdge {} {
  Refine 4
  Time { iend = 1 }
  EventBalance { istep = 10 } 1.2
}
GfsBox {}
"""
    sim = gc.parse_gfs(gfs)
    s = gc.build_simulation(sim)
    evs = [e for e in s.events
           if isinstance(e, balance.EventBalance)]
    assert len(evs) == 1
    assert evs[0].istep == 10
    assert evs[0].max_ratio == 1.2
