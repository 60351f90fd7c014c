"""Offline evaluator for answer-given benchmark checkpoints.

Runs deterministic (argmax) and stochastic episodes from a checkpoint
directory on fresh tasks and reports per-episode success rate — the
paper's §4.1 headline metric — without touching a live training run.

Usage:
    env PYTHONPATH= JAX_PLATFORMS=cpu python scripts/eval_answer_given.py \
        --ckpt-dir runs/ckpt_ag6 [--colors 10] [--n-envs 512] [--steps 50]
"""

from __future__ import annotations

import argparse
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from arcle_tpu.benchmarks import (
    answer_given_agent, answer_given_env, make_policy,
)
from arcle_tpu.training.ppo import PPOConfig, make_optimizer
from arcle_tpu.training.rollout import decode_bbox_actions
from arcle_tpu.utils.checkpoint import Checkpointer


def evaluate(ckpt_dir: str, step=None, n_envs: int = 512,
             steps: int = 50, colors: int = 10, size: int = 5,
             seed: int = 1234, arch: str = "color_eq",
             n_layer: int = 4, n_head: int = 4, n_embd: int = 128,
             bbox_dist: str = "categorical", setting: str = "random",
             env_seed=None):
    """``env_seed`` controls the eval task bank.  It defaults to
    ``seed + 900001`` — a fixed offset so that evaluating with the same
    ``--seed`` a training run used still draws a *disjoint* task set
    (the bank is regenerated deterministically from its seed; in the
    finite ARC setting the offset is what realizes the train/eval
    split).  Pass ``--env-seed`` explicitly to pin a specific bank."""
    if env_seed is None:
        env_seed = seed + 900001
    model = make_policy(h=size, w=size, colors=colors, n_layer=n_layer,
                        n_head=n_head, n_embd=n_embd,
                        factorized=(arch == "nonseq"),
                        color_equivariant=(arch == "color_eq"),
                        bbox_dist_kind=bbox_dist)
    agent = answer_given_agent(model, sequential=(arch == "sequential"))
    env = answer_given_env(n_tasks=4096, h=size, w=size, colors=colors,
                           seed=env_seed, episode_limit=steps,
                           setting=setting)
    key = jax.random.key(seed)
    bs = env.reset(key, n_envs)
    params0 = agent.init_fn(key, agent.obs_fn(
        jax.tree.map(lambda x: x[:1], bs.env)))
    tx = make_optimizer(PPOConfig(max_grad_norm=1.0))
    ck = Checkpointer(ckpt_dir)
    it = ck.latest_step() if step is None else step
    restored = ck.restore({"params": params0, "opt_state": tx.init(params0),
                           "key": jax.random.key_data(key),
                           "iteration": 0}, step=it)
    params = restored["params"]

    env_nr = dataclasses.replace(env, auto_reset=False)
    jst = jax.jit(env_nr.step)

    out = {}
    for mode, det in (("deterministic", True), ("stochastic", False)):
        b = env.reset(jax.random.key(seed + 1), n_envs)
        solved = np.zeros(n_envs, bool)
        lens = np.full(n_envs, steps, np.int32)
        for t in range(steps):
            obs = agent.obs_fn(b.env)
            acts, lp, v = agent.sample_fn(params, obs,
                                          jax.random.key(seed + 2 + t), det)
            b, ob, rew, term, trunc = jst(
                b, decode_bbox_actions(acts, size, size))
            tm = np.asarray(term)
            lens[tm & ~solved] = np.minimum(lens[tm & ~solved], t + 1)
            solved |= tm
        wrong = np.asarray(
            (b.env.grid != b.env.answer).sum(axis=(1, 2)))
        out[mode] = {
            "success_rate": float(solved.mean()),
            "mean_final_wrong": float(wrong[~solved].mean())
            if (~solved).any() else 0.0,
            "mean_solve_len": float(lens[solved].mean())
            if solved.any() else float("nan"),
        }
        print(f"[iter {it}] {mode}: success {solved.mean():.3f}  "
              f"final-wrong(unsolved) {out[mode]['mean_final_wrong']:.2f}  "
              f"solve-len {out[mode]['mean_solve_len']:.1f}")
    return it, out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--step", type=int, default=None)
    ap.add_argument("--n-envs", type=int, default=512)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--colors", type=int, default=10)
    ap.add_argument("--size", type=int, default=5)
    ap.add_argument("--arch", default="color_eq")
    ap.add_argument("--bbox-dist", default="categorical")
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--env-seed", type=int, default=None,
                    help="eval task-bank seed; default seed+900001 so "
                         "reusing the training --seed still evaluates "
                         "on a disjoint bank")
    ap.add_argument("--setting", default="random",
                    choices=["random", "arc"])
    a = ap.parse_args(argv)
    evaluate(a.ckpt_dir, a.step, a.n_envs, a.steps, a.colors, a.size,
             a.seed, a.arch, bbox_dist=a.bbox_dist, setting=a.setting,
             env_seed=a.env_seed)


if __name__ == "__main__":
    main()
