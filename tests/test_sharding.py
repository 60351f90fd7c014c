"""Multi-device sharding: env batch over a mesh, sharded PPO step,
graft entry points (8 virtual CPU devices via conftest)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from arcle_tpu.core.state import Action
from arcle_tpu.envs import BatchedEnv
from arcle_tpu.loaders import SyntheticLoader
from arcle_tpu.ops import o2arc_table
from arcle_tpu.parallel import (
    make_mesh, data_model_mesh, shard_leading, replicate, shard_params_tp,
)

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(len(jax.devices()) < 8,
                                 reason="needs 8 virtual devices")]


def test_sharded_env_step_matches_single_device():
    mesh = make_mesh((8,), ("data",))
    env = BatchedEnv(table=o2arc_table(max_trial=3),
                     bank=SyntheticLoader(4, seed=0).bank(), max_trial=3,
                     episode_limit=20, auto_reset=True)
    B = 32
    bs = env.reset(jax.random.key(0), B)
    rng = np.random.default_rng(0)
    sels = rng.integers(0, 2, (B, 30, 30)).astype(np.int8)
    ops = rng.integers(0, 35, (B,)).astype(np.int32)
    act = Action(selection=jnp.asarray(sels), operation=jnp.asarray(ops))

    # unsharded result
    out1 = jax.jit(type(env).step)(env, bs, act)

    # sharded: envs + action over the data axis
    bs_s = shard_leading(bs, mesh, "data")
    act_s = shard_leading(act, mesh, "data")
    env_s = shard_leading(env, mesh, "data")  # bank small -> replicated
    with mesh:
        out2 = jax.jit(type(env).step)(env_s, bs_s, act_s)

    def raw(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
            x = jax.random.key_data(x)
        return np.asarray(x)

    for a, b in zip(jax.tree.leaves(out1), jax.tree.leaves(out2)):
        np.testing.assert_array_equal(raw(a), raw(b))
    # the carry really is sharded over devices
    assert len(out2[0].env.grid.sharding.device_set) == 8


def _rollout_compiled(mesh, B, sharded):
    from arcle_tpu.training import mlp_agent, rollout
    from arcle_tpu.models import FCPolicy

    env = BatchedEnv(table=o2arc_table(max_trial=3),
                     bank=SyntheticLoader(4, seed=1).bank(), max_trial=3,
                     episode_limit=10, auto_reset=True)
    agent = mlp_agent(FCPolicy(hidden=(32,), n_ops=35))
    bs = env.reset(jax.random.key(0), B)
    params = agent.init_fn(jax.random.key(1),
                           agent.obs_fn(jax.tree.map(lambda x: x[:1],
                                                     bs.env)))
    if sharded:
        bs = shard_leading(bs, mesh, "data")
        params = replicate(params, mesh)
    fn = jax.jit(rollout, static_argnums=(4, 5))
    with mesh:
        compiled = fn.lower(env, bs, params, jax.random.key(2), 5,
                            agent).compile()
        out = fn(env, bs, params, jax.random.key(2), 5, agent)
    return compiled, out


def _flops(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca["flops"])


def test_scaling_efficiency_sharded_cost():
    """A sharding regression that silently replicates the env batch would
    leave every device stepping all B envs.  Guard: the per-device compiled
    cost of the 8-way-sharded rollout must be well under the single-module
    cost of the unsharded one (ideally ~1/8), and the stepped carry and
    trajectory must actually live distributed across all 8 devices."""
    mesh = make_mesh((8,), ("data",))
    B = 32
    comp_u, _ = _rollout_compiled(mesh, B, sharded=False)
    comp_s, (bs, traj, last_v) = _rollout_compiled(mesh, B, sharded=True)
    flops_u, flops_s = _flops(comp_u), _flops(comp_s)
    # cost_analysis reports the per-device SPMD module; allow generous
    # slack over the ideal 1/8 for collective/bookkeeping overhead
    assert flops_s < flops_u * 0.5, (flops_s, flops_u)
    assert np.isfinite(np.asarray(traj.rewards)).all()
    assert len(bs.env.grid.sharding.device_set) == 8, bs.env.grid.sharding
    assert len(traj.obs.sharding.device_set) == 8, traj.obs.sharding
    # per-device shards really are B/8 rows (no replication): addressable
    # shard of the trajectory covers only its slice of the batch axis
    shard_rows = {s.data.shape[1] for s in traj.obs.addressable_shards}
    assert shard_rows == {B // 8}, shard_rows


def test_graft_entry_points():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape[-1] == 35

    __graft_entry__.dryrun_multichip(8)


def test_emaml_step_sharded_over_mesh():
    """The full E-MAML train step (inner loop + meta replay) runs with the
    env batch sharded over the data axis — the mesh counterpart of the
    reference's multi-worker Ray E-MAML (each task's envs distributed).
    Guards that the per-task reshape (T, -1) and the ResetPool layout stay
    SPMD-compatible."""
    from arcle_tpu.envs.core import ResetOptions
    from arcle_tpu.models import FCPolicy
    from arcle_tpu.training import mlp_agent
    from arcle_tpu.training.emaml import (
        EMAMLConfig, init_emaml, emaml_train_step, sample_task_assignment)

    mesh = make_mesh((8,), ("data",))
    cfg = EMAMLConfig(n_tasks=2, envs_per_task=8, rollout_steps=6,
                      inner_steps=2, maml_opt_steps=1, first_order=True)
    bank = SyntheticLoader(6, seed=4).bank()
    agent = mlp_agent(FCPolicy(hidden=(16,), n_ops=35))
    assign = sample_task_assignment(jax.random.key(1), 6, cfg)
    opts = ResetOptions(prob_index=assign,
                        subprob_index=jnp.full_like(assign, -1),
                        adaptation=jnp.ones((), bool),
                        reset_on_submit=jnp.zeros((), bool))
    env = BatchedEnv(table=o2arc_table(7, crop_at_33=True), bank=bank,
                     max_trial=7, episode_limit=6, auto_reset=True,
                     dense_reward=True, augment=True, opts=opts,
                     reset_pool=4)
    B = cfg.n_tasks * cfg.envs_per_task          # 16 envs over 8 devices
    st = init_emaml(agent, cfg, jax.random.key(0), n_bank_tasks=6)
    bs = env.reset(jax.random.key(2), B)

    # unsharded reference result
    st_ref, _, m_ref = jax.jit(emaml_train_step, static_argnums=(3, 4))(
        st, env, bs, agent, cfg)

    bs_sh = shard_leading(bs, mesh, "data")
    st_sh = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), st)
    with mesh:
        st2, bs2, m = jax.jit(emaml_train_step, static_argnums=(3, 4))(
            st_sh, env, bs_sh, agent, cfg)
    assert np.isfinite(float(m["meta_loss"]))
    assert len(bs2.env.grid.sharding.device_set) == 8
    # numerics match the single-device step
    np.testing.assert_allclose(float(m["meta_loss"]),
                               float(m_ref["meta_loss"]), rtol=1e-4)
    deltas = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                          st2.params, st_ref.params)
    assert max(jax.tree.leaves(deltas)) < 1e-5
