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
