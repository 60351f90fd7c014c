"""Training stack: rollout, GAE, PPO update, E-MAML step, models."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from arcle_tpu.envs import BatchedEnv, ResetOptions
from arcle_tpu.loaders import SyntheticLoader
from arcle_tpu.ops import o2arc_table
from arcle_tpu.models import (
    FCPolicy, GPTPolicy, GPTConfig, TruncatedNormal, bbox_dist,
    HyperMLP,
)
from arcle_tpu.training import (
    rollout, gae, PPOConfig, batch_from_trajectory, ppo_loss,
    make_optimizer, train_step, EMAMLConfig, init_emaml, emaml_train_step,
    sample_task_assignment, mlp_agent, gpt_agent,
)
from arcle_tpu.wrappers import flatten_obs

OBS_DIM = 2710  # FilterO2ARC flattened width (3*900 + 4*2 + 2*1)


def small_policy():
    return FCPolicy(hidden=(64, 64), n_ops=35)


def make_env(auto=True, limit=20):
    return BatchedEnv(table=o2arc_table(max_trial=3),
                      bank=SyntheticLoader(6, seed=0).bank(), max_trial=3,
                      episode_limit=limit, auto_reset=auto)


def test_flatten_obs_width():
    env = make_env()
    bs = env.reset(jax.random.key(0), 4)
    flat = flatten_obs(bs.env)
    assert flat.shape == (4, OBS_DIM)


def test_rollout_shapes_and_gae():
    env = make_env()
    B, T = 8, 12
    agent = mlp_agent(small_policy())
    bs = env.reset(jax.random.key(0), B)
    params = agent.init_fn(jax.random.key(1), flatten_obs(bs.env))
    bs, traj, last_v = jax.jit(
        rollout, static_argnums=(4, 5, 6))(env, bs, params,
                                           jax.random.key(2), T, agent)
    assert traj.obs.shape == (T, B, OBS_DIM)
    assert traj.actions.shape == (T, B, 5)
    assert traj.rewards.shape == (T, B)
    adv, ret = gae(traj, last_v, 0.9, 0.95)
    assert adv.shape == (T, B)
    assert np.isfinite(np.asarray(adv)).all()


def test_gae_against_reference_formula():
    """Closed-form check on a hand-built no-done trajectory."""
    from arcle_tpu.training.rollout import Trajectory
    T, B = 4, 1
    vals = jnp.asarray([[1.], [2.], [3.], [4.]])
    rews = jnp.asarray([[1.], [1.], [1.], [1.]])
    zeros = jnp.zeros((T, B), bool)
    traj = Trajectory(obs=jnp.zeros((T, B, 1)), actions=jnp.zeros((T, B, 5), jnp.int32),
                      log_probs=jnp.zeros((T, B)), values=vals, rewards=rews,
                      dones=zeros, terminated=zeros)
    gamma, lam = 0.9, 0.8
    adv, ret = gae(traj, jnp.asarray([5.]), gamma, lam)
    # manual backward recursion
    expect = np.zeros((T, 1))
    nxt = 0.0
    v_next = 5.0
    for t in reversed(range(T)):
        delta = 1.0 + gamma * v_next - float(vals[t, 0])
        nxt = delta + gamma * lam * nxt
        expect[t, 0] = nxt
        v_next = float(vals[t, 0])
    np.testing.assert_allclose(np.asarray(adv), expect, rtol=1e-5)


def test_ppo_train_step_improves_loss():
    env = make_env()
    B, T = 16, 20
    agent = mlp_agent(small_policy())
    cfg = PPOConfig(n_epochs=2, n_minibatches=2, lr=1e-3)
    bs = env.reset(jax.random.key(0), B)
    params = agent.init_fn(jax.random.key(1), flatten_obs(bs.env))
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    bs, traj, last_v = rollout(env, bs, params, jax.random.key(2), T, agent)
    batch = batch_from_trajectory(traj, last_v, cfg)
    loss0, _ = ppo_loss(params, agent, batch, cfg)
    params2, opt_state, stats = jax.jit(
        train_step, static_argnums=(4, 5, 6))(params, opt_state, batch,
                                              jax.random.key(3), agent,
                                              tx, cfg)
    loss1, _ = ppo_loss(params2, agent, batch, cfg)
    assert np.isfinite(float(loss1))
    assert float(loss1) < float(loss0)  # optimizing the same batch must help


def test_emaml_step_runs_and_updates():
    cfg = EMAMLConfig(n_tasks=2, envs_per_task=3, rollout_steps=6,
                      inner_steps=2, maml_opt_steps=1,
                      ppo=PPOConfig())
    agent = mlp_agent(small_policy())
    bank = SyntheticLoader(5, seed=1).bank()
    key = jax.random.key(0)
    assign = sample_task_assignment(jax.random.key(5), 5, cfg)
    assert assign.shape == (cfg.n_tasks * cfg.envs_per_task,)
    opts = ResetOptions(
        prob_index=assign, subprob_index=jnp.full_like(assign, -1),
        adaptation=jnp.ones((), bool), reset_on_submit=jnp.zeros((), bool))
    env = BatchedEnv(table=o2arc_table(max_trial=3), bank=bank, max_trial=3,
                     episode_limit=6, auto_reset=True, opts=opts)
    bs = env.reset(jax.random.key(1), cfg.n_tasks * cfg.envs_per_task)
    # envs are pinned to their assigned tasks (pin the pair too to check)
    opts_pinned = ResetOptions(
        prob_index=assign, subprob_index=jnp.zeros_like(assign),
        adaptation=jnp.ones((), bool), reset_on_submit=jnp.zeros((), bool))
    env_pinned = BatchedEnv(table=o2arc_table(max_trial=3), bank=bank,
                            max_trial=3, opts=opts_pinned)
    bsp = env_pinned.reset(jax.random.key(1),
                           cfg.n_tasks * cfg.envs_per_task)
    dims = np.asarray(bsp.env.input_dim).reshape(cfg.n_tasks,
                                                 cfg.envs_per_task, 2)
    for tt in range(cfg.n_tasks):
        assert (dims[tt] == dims[tt][0]).all()

    st = init_emaml(agent, cfg, key)
    st2, bs2, metrics = jax.jit(
        emaml_train_step, static_argnums=(3, 4))(st, env, bs, agent, cfg)
    assert np.isfinite(float(metrics["meta_loss"]))
    changed = jax.tree.map(
        lambda a, b: not np.array_equal(np.asarray(a), np.asarray(b)),
        st.params, st2.params)
    assert any(jax.tree.leaves(changed))
    assert metrics["post_reward_per_task"].shape == (cfg.n_tasks,)


def test_truncated_normal_matches_reference_torch():
    """Sample/statistics sanity + log_prob vs torch reference impl."""
    tn = TruncatedNormal.create(jnp.asarray([0.3, 0.9]),
                                jnp.asarray([0.2, 0.5]), 0.0, 1.0)
    s = tn.sample(jax.random.key(0), (2000,))
    assert float(s.min()) >= 0.0 and float(s.max()) <= 1.0
    lp = tn.log_prob(jnp.asarray([0.3, 0.5]))
    assert np.isfinite(np.asarray(lp)).all()
    # cross-check against scipy truncnorm
    from scipy.stats import truncnorm
    a = (0 - 0.3) / 0.2
    b = (1 - 0.3) / 0.2
    np.testing.assert_allclose(
        float(lp[0]), truncnorm.logpdf(0.3, a, b, loc=0.3, scale=0.2),
        rtol=1e-4)


def test_bbox_dist_roundtrip():
    key = jax.random.key(0)
    B, n_ops, D = 4, 35, 16
    logits = jax.random.normal(key, (B, n_ops))
    tokens = jax.random.normal(key, (B, n_ops, D))
    wm = jax.random.normal(jax.random.key(1), (D, 4)) * 0.1
    ws = jax.random.normal(jax.random.key(2), (D, 4)) * 0.1
    head_mean = lambda t: t @ wm
    head_std = lambda t: t @ ws
    s = bbox_dist.sample(key, logits, tokens, head_mean, head_std)
    assert s.bbox.shape == (B, 4)
    assert (np.asarray(s.bbox) >= 0).all() and (np.asarray(s.bbox) < 30).all()
    lp = bbox_dist.log_prob(logits, tokens, s.operation, s.bbox,
                            head_mean, head_std)
    assert np.isfinite(np.asarray(lp)).all()
    ent = bbox_dist.entropy(logits, tokens, s.operation, head_mean, head_std)
    assert np.isfinite(np.asarray(ent)).all()


def test_gpt_policy_forward():
    cfg = GPTConfig(n_layer=2, n_head=4, n_embd=32)
    model = GPTPolicy(cfg)
    B = 2
    env = make_env()
    bs = env.reset(jax.random.key(0), B)
    s = bs.env
    params = model.init(jax.random.key(1), s.grid, s.grid_dim, s.input,
                        s.input_dim, s.trials_remain, s.active)
    out = jax.jit(lambda p, *a: model.apply(p, *a))(
        params, s.grid, s.grid_dim, s.input, s.input_dim,
        s.trials_remain, s.active)
    assert out["op_logits"].shape == (B, 35)
    assert out["op_tokens"].shape == (B, 35, 32)
    assert out["value"].shape == (B,)
    assert out["aux_transition"].shape == (B, 900, 10)
    assert np.isfinite(np.asarray(out["op_logits"])).all()


def test_hypermlp_forward():
    m = HyperMLP(widths=(32,), out=4)
    x = jnp.ones((3, 8))
    params = m.init(jax.random.key(0), x)
    y = m.apply(params, x)
    assert y.shape == (3, 4)
