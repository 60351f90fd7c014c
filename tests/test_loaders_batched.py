"""Loaders, task banks, device-side reset, batched engine + auto-reset."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from arcle_tpu.loaders import (
    ARCLoader, MiniARCLoader, SyntheticLoader, ListLoader, bake_bank,
)
from arcle_tpu.core.state import Action
from arcle_tpu.envs import reset, ResetOptions, BatchedEnv
from arcle_tpu.ops import o2arc_table, raw_table

pytestmark = pytest.mark.slow  # compile-heavy tier



def test_bundled_loaders_parse():
    a = ARCLoader()
    assert len(a.data) == 16
    m = MiniARCLoader()
    assert len(m.data) == 8
    assert all(t[-1].get("description") is not None for t in m.data)
    e = ARCLoader(train=False)
    assert len(e.data) == 8


def test_loader_pick_pinned():
    a = ARCLoader()
    t0 = a.pick(data_index=0)
    assert t0[-1]["id"] == "synth000"
    with pytest.raises(AssertionError):
        a.pick(data_index=999)


def test_bank_indexing_matches_host():
    loader = SyntheticLoader(6, seed=3)
    bank = loader.bank()
    # pair (task 2, train pair 1) must equal the host-side data
    ti, to, ei, eo, _ = loader.data[2]
    flat = int(bank.train_offset[2]) + 1
    got = np.asarray(bank.in_grids[flat])
    h, w = ti[1].shape
    np.testing.assert_array_equal(got[:h, :w], ti[1])
    assert (got[h:, :] == 0).all() and (got[:, w:] == 0).all()
    np.testing.assert_array_equal(np.asarray(bank.out_dims[flat]),
                                  np.array(to[1].shape))
    # test split
    flat_t = int(bank.test_offset[2])
    h2, w2 = ei[0].shape
    np.testing.assert_array_equal(
        np.asarray(bank.in_grids[flat_t])[:h2, :w2], ei[0])


def test_device_reset_pinned_and_sampled():
    loader = SyntheticLoader(5, seed=4)
    bank = loader.bank()
    key = jax.random.key(0)
    st = reset(bank, key, ResetOptions.make(prob_index=3, subprob_index=0,
                                            adaptation=True), max_trial=3)
    ti = loader.data[3][0][0]
    np.testing.assert_array_equal(
        np.asarray(st.grid)[:ti.shape[0], :ti.shape[1]], ti)
    assert int(st.trials_remain) == 3
    # sampled resets are deterministic in the key
    s1 = reset(bank, key, ResetOptions.make(), 3)
    s2 = reset(bank, key, ResetOptions.make(), 3)
    np.testing.assert_array_equal(np.asarray(s1.input), np.asarray(s2.input))


def test_batched_env_auto_reset():
    loader = SyntheticLoader(4, seed=5)
    env = BatchedEnv(table=o2arc_table(max_trial=1), bank=loader.bank(),
                     max_trial=1, episode_limit=5, auto_reset=True)
    B = 32
    bs = env.reset(jax.random.key(1), B)
    assert bs.env.grid.shape == (B, 30, 30)

    stepfn = jax.jit(env.step)
    sel = jnp.zeros((B, 30, 30), jnp.int8)
    # Submit on every env: with max_trial=1 everyone terminates and must be
    # auto-reset to a fresh task (trials refilled, steps zeroed).
    act = Action(selection=sel, operation=jnp.full((B,), 34, jnp.int32))
    bs2, obs, rew, term, trunc = stepfn(bs, act)
    assert bool(term.all())
    assert (np.asarray(obs.trials_remain) == 0).all()       # observed final
    assert (np.asarray(bs2.env.trials_remain) == 1).all()   # reset carry
    assert (np.asarray(bs2.env.steps) == 0).all()

    # episode_limit truncation: 5 noop steps => truncated
    act_noop = Action(selection=sel, operation=jnp.zeros((B,), jnp.int32))
    bs = env.reset(jax.random.key(2), B)
    for i in range(5):
        bs, obs, rew, term, trunc = stepfn(bs, act_noop)
    assert bool(trunc.all())
    assert (np.asarray(bs.env.steps) == 0).all()   # reset after truncation


def test_batched_env_no_auto_reset_matches_gym_semantics():
    loader = SyntheticLoader(4, seed=6)
    env = BatchedEnv(table=raw_table(max_trial=2), bank=loader.bank(),
                     max_trial=2, auto_reset=False)
    B = 8
    bs = env.reset(jax.random.key(3), B)
    act = Action(selection=jnp.zeros((B, 30, 30), jnp.int8),
                 operation=jnp.full((B,), 11, jnp.int32))
    bs, obs, rew, term, trunc = jax.jit(env.step)(bs, act)
    assert (np.asarray(bs.env.trials_remain) == 1).all()
    bs, obs, rew, term, trunc = jax.jit(env.step)(bs, act)
    assert bool(term.all())   # trials exhausted, sticky


def test_reset_distribution_covers_tasks():
    loader = SyntheticLoader(4, seed=7)
    bank = loader.bank()
    keys = jax.random.split(jax.random.key(9), 256)
    st = jax.vmap(lambda k: reset(bank, k, ResetOptions.make(), -1))(keys)
    dims = np.asarray(st.input_dim)
    assert len(np.unique(dims, axis=0)) > 1   # multiple tasks sampled


def test_batched_determinism_under_fixed_seed():
    """Same key => bit-identical resets and rollouts (SURVEY §4 item)."""
    from arcle_tpu.core.state import Action
    import dataclasses
    loader = SyntheticLoader(6, seed=9)
    env = BatchedEnv(table=o2arc_table(max_trial=3), bank=loader.bank(),
                     max_trial=3, episode_limit=10, auto_reset=True)
    outs = []
    for _ in range(2):
        bs = env.reset(jax.random.key(42), 16)
        key = jax.random.key(7)
        for t in range(12):
            key, ka = jax.random.split(key)
            ops = jax.random.randint(ka, (16,), 0, 35)
            sel = (jax.random.uniform(ka, (16, 30, 30)) < 0.1).astype(jnp.int8)
            bs, obs, rew, term, trunc = jax.jit(type(env).step)(
                env, bs, Action(selection=sel, operation=ops))
        outs.append(bs)
    for f in dataclasses.fields(outs[0].env):
        np.testing.assert_array_equal(
            np.asarray(getattr(outs[0].env, f.name)),
            np.asarray(getattr(outs[1].env, f.name)), err_msg=f.name)


def test_parity_wide_batch_single_step():
    """256-env vmapped step equals per-env oracle results (wide-batch
    semantics invariance, BASELINE config 2 scale)."""
    from arcle_tpu.core.state import Action
    from arcle_tpu.ops import step as step_fn
    from arcle_tpu.oracle import OracleEnv
    from test_oracle_vs_reference import random_grid, random_selection
    import jax

    rng = np.random.default_rng(12)
    B = 256
    table = o2arc_table(max_trial=3)
    inps, outs_, states = [], [], []
    from test_engine_vs_oracle import jax_state_from
    for i in range(B):
        inp = random_grid(rng, int(rng.integers(2, 12)), int(rng.integers(2, 12)))
        out = random_grid(rng, int(rng.integers(2, 12)), int(rng.integers(2, 12)))
        inps.append(inp); outs_.append(out)
        states.append(jax_state_from(inp, out, 3))
    batched = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
    ops = rng.integers(0, 35, B)
    sels = np.stack([random_selection(rng) for _ in range(B)])
    act = Action(selection=jnp.asarray(sels), operation=jnp.asarray(ops, jnp.int32))
    vstep = jax.jit(jax.vmap(step_fn, in_axes=(0, 0, None)), static_argnums=2)
    b2, rew, term = vstep(batched, act, table)
    for i in range(0, B, 17):   # spot-check a spread of envs
        orc = OracleEnv("o2arc", max_trial=3)
        orc.reset(inps[i], outs_[i])
        ostate, orew, _ = orc.step(sels[i], int(ops[i]))
        np.testing.assert_array_equal(np.asarray(b2.grid[i]), ostate["grid"])
        assert float(rew[i]) == orew


def test_auto_reset_with_legacy_uint32_keys():
    """Raw PRNGKey (uint32 [2]) layout must work through auto-reset
    (regression: done-mask broadcast against [B, 2] keys)."""
    env = BatchedEnv(table=o2arc_table(max_trial=1),
                     bank=SyntheticLoader(4, seed=0).bank(), max_trial=1,
                     episode_limit=3, auto_reset=True)
    B = 4
    bs = env.reset(jax.random.PRNGKey(0), B)   # legacy key
    act = Action(selection=jnp.zeros((B, 30, 30), jnp.int8),
                 operation=jnp.full((B,), 34, jnp.int32))
    bs2, obs, rew, term, trunc = jax.jit(type(env).step)(env, bs, act)
    assert bool(term.all())
    assert (np.asarray(bs2.env.trials_remain) == 1).all()


def test_arcloader_real_corpus_scale(tmp_path):
    """Reference-scale data path (loader.py:72-87 envelope): a generated
    ARC-layout corpus with >1000 pairs loads through ARCLoader via
    ARC_DATA_DIR, bakes to a device TaskBank, and a wide batch gathers
    tasks correctly on reset."""
    from arcle_tpu.loaders.synthetic import write_corpus

    n_tasks = 150
    pairs = write_corpus(str(tmp_path), n_tasks=n_tasks, n_train=6,
                         n_test=2, seed=13, max_size=20)
    assert pairs == n_tasks * 8 > 1000
    loader = ARCLoader(root=str(tmp_path))
    assert len(loader.data) == n_tasks
    bank = loader.bank()
    assert bank.n_pairs == pairs
    assert bank.n_tasks == n_tasks

    # device gather == host parse for a spread of (task, pair) indices
    for t in (0, 17, 149):
        ti, to, ei, eo, _ = loader.data[t]
        flat = int(bank.train_offset[t])
        h, w = ti[0].shape
        np.testing.assert_array_equal(
            np.asarray(bank.in_grids[flat])[:h, :w], ti[0])

    # a 256-env batch pinned across all tasks resets to the right pairs
    B = 256
    prob = jnp.arange(B, dtype=jnp.int32) % n_tasks
    opts = ResetOptions(
        prob_index=prob, subprob_index=jnp.zeros((B,), jnp.int32),
        adaptation=jnp.ones((), bool), reset_on_submit=jnp.zeros((), bool))
    env = BatchedEnv(table=o2arc_table(max_trial=3), bank=bank, max_trial=3,
                     episode_limit=10, auto_reset=True, opts=opts)
    bs = env.reset(jax.random.key(0), B)
    dims = np.asarray(bs.env.input_dim)
    for i in (0, 63, 200):
        t = int(prob[i])
        np.testing.assert_array_equal(
            dims[i], np.array(loader.data[t][0][0].shape))
    # and steps fine at that width
    act = Action(selection=jnp.zeros((B, 30, 30), jnp.int8),
                 operation=jnp.full((B,), 0, jnp.int32))
    bs2, obs, rew, term, trunc = jax.jit(type(env).step)(env, bs, act)
    assert obs.grid.shape == (B, 30, 30)


def test_reset_pool_entries_are_valid_fresh_states():
    """Pool entries must be exactly what a reset would produce: grid =
    input masked to dims, zeros outside (base.py:164 semantics)."""
    from arcle_tpu.loaders import SyntheticLoader
    env = BatchedEnv(table=o2arc_table(3, crop_at_33=True),
                     bank=SyntheticLoader(4, seed=1).bank(), max_trial=3,
                     episode_limit=5, auto_reset=True, augment=True,
                     reset_pool=4)
    bs = env.reset(jax.random.key(0), 8)
    assert bs.pool is not None and bs.pool.grid.shape == (32, 30, 30)
    g, d = np.asarray(bs.pool.grid), np.asarray(bs.pool.dim)
    for i in range(32):
        h, w = int(d[i, 0]), int(d[i, 1])
        assert 0 < h <= 30 and 0 < w <= 30
        assert (g[i][h:, :] == 0).all() and (g[i][:, w:] == 0).all()


def test_pooled_auto_reset_consumes_pool_entries():
    """After a pooled auto-reset the env state must equal the consumed
    pool entry with all transient fields reinitialized."""
    from arcle_tpu.loaders import SyntheticLoader
    B, K = 4, 4
    env = BatchedEnv(table=o2arc_table(3, crop_at_33=True),
                     bank=SyntheticLoader(4, seed=1).bank(), max_trial=3,
                     episode_limit=5, auto_reset=True, dense_reward=True,
                     augment=True, reset_pool=K)
    bs = env.reset(jax.random.key(0), B)
    g0, d0 = np.asarray(bs.pool.grid), np.asarray(bs.pool.dim)
    a0, ad0 = np.asarray(bs.pool.answer), np.asarray(bs.pool.answer_dim)
    step = jax.jit(BatchedEnv.step)
    submit = Action(selection=jnp.zeros((B, 30, 30), jnp.int8),
                    operation=jnp.full((B,), 34, jnp.int32))
    for _ in range(3):                       # exhaust max_trial=3
        bs, obs, rew, te, tr = step(env, bs, submit)
    assert np.asarray(te | tr).all()
    ctr = np.asarray(bs.pool.counter)
    assert (ctr == 1).all()
    eg, ei = np.asarray(bs.env.grid), np.asarray(bs.env.input)
    ea, ed = np.asarray(bs.env.answer), np.asarray(bs.env.grid_dim)
    ead = np.asarray(bs.env.answer_dim)
    for i in range(B):
        j = i * K + (ctr[i] - 1) % K
        assert (eg[i] == g0[j]).all() and (ei[i] == g0[j]).all()
        assert (ea[i] == a0[j]).all() and (ed[i] == d0[j]).all()
        assert (ead[i] == ad0[j]).all()
    assert np.asarray(bs.env.trials_remain).tolist() == [3] * B
    assert np.asarray(bs.env.steps).tolist() == [0] * B
    assert np.asarray(bs.env.active).tolist() == [0] * B
    # counters wrap modulo K without error
    for _ in range(3 * (K + 1)):
        bs, obs, rew, te, tr = step(env, bs, submit)
    assert (np.asarray(bs.pool.counter) == K + 2).all()


def test_pooled_rollout_refreshes_pool_and_trains():
    """rollout() must refresh the pool per call and ride it through the
    scan; the resulting trajectory feeds train_step unchanged."""
    from arcle_tpu.loaders import SyntheticLoader
    from arcle_tpu.models.mlp import FCPolicy
    from arcle_tpu.training.agents import mlp_agent
    from arcle_tpu.training.rollout import rollout
    from arcle_tpu.training.ppo import (
        PPOConfig, batch_from_trajectory, train_step, make_optimizer)

    B = 4
    ag = mlp_agent(FCPolicy(hidden=(16,), n_ops=35))
    env = BatchedEnv(table=o2arc_table(127, crop_at_33=True),
                     bank=SyntheticLoader(4, seed=1).bank(), max_trial=127,
                     episode_limit=8, auto_reset=True, dense_reward=True,
                     augment=True, reset_pool=4)
    bs = env.reset(jax.random.key(5), B)
    params = ag.init_fn(jax.random.key(1), ag.obs_fn(
        jax.tree.map(lambda x: x[:1], bs.env)))
    roll_j = jax.jit(rollout, static_argnums=(4, 5))
    bs3, traj, lv = roll_j(env, bs, params, jax.random.key(2), 20, ag)
    assert int(np.asarray(traj.dones).sum()) > 0
    assert np.asarray(bs3.pool.counter).sum() > 0
    cfg = PPOConfig()
    batch = batch_from_trajectory(traj, lv, cfg)
    tx = make_optimizer(cfg)
    p2, o2, stats = jax.jit(train_step, static_argnums=(4, 5, 6))(
        params, tx.init(params), batch, jax.random.key(3), ag, tx, cfg)
    assert np.isfinite(float(stats["total_loss"]))


def test_pooled_reset_respects_task_pinning():
    """Per-env pinned ResetOptions rows must carry into each env slot's
    pool segment (the E-MAML task-pinning contract)."""
    from arcle_tpu.loaders import SyntheticLoader
    bank = SyntheticLoader(6, seed=2).bank()
    pins = jnp.asarray([0, 3, 5, 1], jnp.int32)
    opts = ResetOptions(prob_index=pins,
                        subprob_index=jnp.full_like(pins, -1),
                        adaptation=jnp.ones((), bool),
                        reset_on_submit=jnp.zeros((), bool))
    env = BatchedEnv(table=o2arc_table(3, crop_at_33=True), bank=bank,
                     max_trial=3, episode_limit=5, auto_reset=True,
                     augment=False, reset_pool=3, opts=opts)
    bs = env.reset(jax.random.key(0), 4)
    g, d = np.asarray(bs.pool.grid), np.asarray(bs.pool.dim)
    # without augmentation each pool grid must equal one of its pinned
    # task's pair inputs (masked to dims)
    ig = np.asarray(bank.in_grids)
    idim = np.asarray(bank.in_dims)
    starts = np.asarray(bank.train_offset)
    counts = np.asarray(bank.train_count)
    for i, t in enumerate(np.asarray(pins)):
        lo = int(starts[t])
        hi = lo + int(counts[t])
        for j in range(3):
            row = g[i * 3 + j]
            ok = False
            for p in range(lo, hi):
                h, w = int(idim[p, 0]), int(idim[p, 1])
                masked = np.zeros_like(ig[p])
                masked[:h, :w] = ig[p][:h, :w]
                if (row == masked).all():
                    ok = True
                    break
            assert ok, (i, j)


def test_pooled_auto_reset_wraps_at_exhaustion():
    """More resets than pool entries: the counter wraps modulo K and
    re-uses entries deterministically (documented ResetPool semantics) —
    stepping stays valid past exhaustion."""
    import jax
    import jax.numpy as jnp
    from arcle_tpu.core.state import Action
    from arcle_tpu.envs import BatchedEnv
    from arcle_tpu.loaders import SyntheticLoader
    from arcle_tpu.ops import o2arc_table

    K = 2
    env = BatchedEnv(table=o2arc_table(max_trial=1), bank=SyntheticLoader(
        4, seed=3).bank(), max_trial=1, episode_limit=2, auto_reset=True,
        reset_pool=K)
    B = 4
    bs = env.reset(jax.random.key(0), B)
    step = jax.jit(type(env).step)
    submit = Action(selection=jnp.zeros((B, 30, 30), jnp.int8),
                    operation=jnp.full((B,), env.table.n_ops - 1, jnp.int8))
    grids_by_slot = []
    # max_trial=1: every submit terminates -> one pool draw per step
    for t in range(2 * K + 1):                     # wraps twice
        bs, obs, rew, term, trunc = step(env, bs, submit)
        assert bool(term.all())
        grids_by_slot.append(np.asarray(bs.env.grid))
    ctr = np.asarray(bs.pool.counter)
    assert (ctr == 2 * K + 1).all(), ctr           # counted past K
    # wrap determinism: reset t and reset t+K draw the same pool entry
    np.testing.assert_array_equal(grids_by_slot[0], grids_by_slot[K])
    np.testing.assert_array_equal(grids_by_slot[1], grids_by_slot[K + 1])
