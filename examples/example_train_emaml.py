"""E-MAML meta-training through the library API (the counterpart of
running /root/reference/agents/train.py, scaled to run anywhere in
seconds).  For full-scale runs use the CLI drivers:

    python -m arcle_tpu.training.train --algo emaml          # MLP
    python -m arcle_tpu.training.supervise --log run.out -- \
        python -m arcle_tpu.training.train_gpt               # GPT
"""
import jax
import jax.numpy as jnp

from arcle_tpu.envs import BatchedEnv
from arcle_tpu.envs.core import ResetOptions
from arcle_tpu.loaders import SyntheticLoader
from arcle_tpu.models import FCPolicy
from arcle_tpu.ops import o2arc_table
from arcle_tpu.training import mlp_agent
from arcle_tpu.training.emaml import (
    EMAMLConfig, init_emaml, emaml_train_step, sample_task_assignment,
)

bank = SyntheticLoader(8, seed=0).bank()
agent = mlp_agent(FCPolicy(hidden=(64, 32), n_ops=35))
cfg = EMAMLConfig(n_tasks=2, envs_per_task=4, rollout_steps=10,
                  inner_steps=2, maml_opt_steps=2, first_order=True)
st = init_emaml(agent, cfg, jax.random.key(0),
                n_bank_tasks=int(bank.n_tasks))
step = jax.jit(emaml_train_step, static_argnums=(3, 4))

key = jax.random.key(1)
for it in range(3):
    # fresh task sample per meta-iteration (reference emaml.py:349-361)
    key, kt, kr = jax.random.split(key, 3)
    assign = sample_task_assignment(kt, int(bank.n_tasks), cfg)
    opts = ResetOptions(prob_index=assign,
                        subprob_index=jnp.full_like(assign, -1),
                        adaptation=jnp.ones((), bool),
                        reset_on_submit=jnp.zeros((), bool))
    env = BatchedEnv(table=o2arc_table(7, crop_at_33=True), bank=bank,
                     max_trial=7, episode_limit=10, auto_reset=True,
                     dense_reward=True, augment=True, opts=opts,
                     reset_pool=4)
    bs = env.reset(kr, cfg.n_tasks * cfg.envs_per_task)
    st, bs, m = step(st, env, bs, agent, cfg)
    print(f"iter {it}: meta_loss={float(m['meta_loss']):.4f} "
          f"post_eprew={float(m['post_eprew_mean']):.3f} "
          f"covered={int(m['num_covered_tasks'])}")
print("ok")
