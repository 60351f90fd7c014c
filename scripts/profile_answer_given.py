"""Wall-clock decomposition of one answer-given training iteration.

Times the three phases of the §4.1 benchmark loop separately on the live
chip — rollout (env + policy sampling), batch building (GAE/shaping), and
the PPO train_step (epochs x minibatches incl. the aux second pass) — so
optimization effort lands where the time actually goes.

Usage:
    timeout 600 python scripts/profile_answer_given.py \
        [--epochs 2] [--minibatches 8] [--n-envs 1024] [--rollout 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from arcle_tpu.benchmarks.answer_given import (
    answer_given_agent, answer_given_env, make_policy, shaping_potential)
from arcle_tpu.training.ppo import (
    PPOConfig, batch_from_trajectory, make_optimizer, train_step)
from arcle_tpu.training.rollout import rollout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--setting", default="arc")
    ap.add_argument("--n-envs", type=int, default=1024)
    ap.add_argument("--rollout", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--minibatches", type=int, default=8)
    ap.add_argument("--arch", default="color_eq")
    ap.add_argument("--aux", default="all")
    ap.add_argument("--n-layer", type=int, default=4)
    ap.add_argument("--n-head", type=int, default=4)
    ap.add_argument("--n-embd", type=int, default=128)
    args = ap.parse_args()

    env = answer_given_env(n_tasks=1024, setting=args.setting, seed=0)
    policy = make_policy(n_layer=args.n_layer, n_head=args.n_head,
                         n_embd=args.n_embd,
                         color_equivariant=(args.arch == "color_eq"))
    agent = answer_given_agent(policy, sequential=(args.arch == "sequential"))
    pcfg = PPOConfig(gamma=0.95, gae_lambda=0.95, clip_eps=0.2,
                     vf_coeff=0.5, lr=3e-4, n_epochs=args.epochs,
                     n_minibatches=args.minibatches, max_grad_norm=1.0,
                     aux_coeff=0.0 if args.aux == "none" else 0.3,
                     aux_terms="all")
    key = jax.random.key(0)
    key, ki, kr = jax.random.split(key, 3)
    bs = env.reset(kr, args.n_envs)
    params = agent.init_fn(ki, agent.obs_fn(
        jax.tree.map(lambda x: x[:1], bs.env)))
    tx = make_optimizer(pcfg)
    opt_state = tx.init(params)
    T = args.rollout

    def phase_rollout(env, bs, params, key):
        bs, traj, last_v = rollout(env, bs, params, key, T, agent)
        return bs, traj, last_v

    def phase_batch(traj, last_v):
        phi_t = shaping_potential(traj.obs, 5, 5)
        term_f = traj.terminated.astype(jnp.float32)
        shaped = (traj.rewards * (1.0 + pcfg.gamma * (1.0 - term_f))
                  - phi_t)
        b = batch_from_trajectory(traj._replace(rewards=shaped), last_v,
                                  pcfg, include_aux=pcfg.aux_coeff > 0,
                                  grid_slice=slice(0, 25))
        return b

    def phase_train(params, opt_state, batch, key):
        return train_step(params, opt_state, batch, key, agent, tx, pcfg,
                          jnp.asarray(0.05, jnp.float32))

    jro = jax.jit(phase_rollout)
    jba = jax.jit(phase_batch)
    jtr = jax.jit(phase_train)

    def run_once():
        t = {}
        t0 = time.perf_counter()
        bs2, traj, last_v = jro(env, bs, params, key)
        jax.block_until_ready(traj.obs)
        _ = float(traj.rewards.sum())
        t["rollout"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        batch = jba(traj, last_v)
        _ = float(batch.advantages.sum())
        t["batch"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        p2, o2, stats = jtr(params, opt_state, batch, key)
        _ = float(stats["total_loss"])
        t["train"] = time.perf_counter() - t0
        return t

    warm = run_once()
    print(f"compile+first: {warm}")
    for it in range(3):
        t = run_once()
        tot = sum(t.values())
        rate = args.n_envs * T / tot
        print(f"iter {it}: total {tot*1e3:.0f} ms -> {rate:,.0f} steps/s | "
              + " ".join(f"{k} {v*1e3:.0f}ms ({v/tot*100:.0f}%)"
                         for k, v in t.items()))


if __name__ == "__main__":
    main()
