#!/usr/bin/env python
"""Decompose the megakernel step cost to identify the binding resource
(round-4 verdict weak #3: 'no analysis of what binds').

Times four scan variants at the headline config (4096 envs x 100 steps,
O2ARC table, auto-reset pool), all with honest host-readback barriers:

  rng_only     — per-step RNG + bbox mask build + checksum (floor)
  kernel_only  — just the Pallas megakernel per step, actions precomputed
                 in HBM (adds ~3.7 MB/step of reads; noted in the output)
  no_epilogue  — RNG + mask build + megakernel (no reward/auto-reset)
  full         — the bench.py hot path (reward shaping + auto-reset cond)

plus a kernel block-size sweep (BLK 64/128/256/512) on the kernel_only
variant: if the kernel is VPU-compute-bound, time scales ~linearly with
the number of grid blocks only until per-op overhead amortizes.

Usage:  python scripts/profile_engine_bind.py [--batch 4096] [--steps 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from arcle_tpu.core.state import Action
    from arcle_tpu.core.geometry import bbox_selection_flat
    from arcle_tpu.envs import BatchedEnv
    from arcle_tpu.envs.core import flatten_grids
    from arcle_tpu.loaders import SyntheticLoader
    from arcle_tpu.ops import o2arc_table
    from arcle_tpu.ops.pallas_step import Geom, _step_impl

    B, T = args.batch, args.steps
    H = W = 30
    P = H * W
    table = o2arc_table(max_trial=-1)
    bank = SyntheticLoader(16, seed=3).bank()
    env = BatchedEnv(table=table, bank=bank, max_trial=-1,
                     episode_limit=100, auto_reset=True, use_pallas=True,
                     reset_pool=8)

    def random_actions(key):
        k1, k2 = jax.random.split(key)
        ops = jax.random.randint(k2, (B,), 0, table.n_ops)
        c = jax.random.randint(k1, (4, B), 0, H)
        sels = jax.vmap(bbox_selection_flat,
                        in_axes=(0, 0, 0, 0, None, None))(
            c[0], c[1], c[2], c[3], H, W)
        return Action(selection=sels, operation=ops)

    def timed(name, fn, *fargs):
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        chk = int(jfn(*fargs))
        log(f"  {name}: compile+first {time.perf_counter() - t0:.1f}s "
            f"(chk={chk})")
        best = float("inf")
        for _ in range(args.iters):
            t0 = time.perf_counter()
            chk = int(jfn(*fargs))
            best = min(best, time.perf_counter() - t0)
        rate = B * T / best
        log(f"  {name}: {best * 1e3:8.1f} ms  {rate:12,.0f} env-steps/s")
        return best

    key = jax.random.key(0)
    bs = env.reset(key, B)
    bs_flat = flatten_grids(bs)
    state0 = bs_flat.env

    # precomputed action stream for the kernel-only variant
    ka = jax.random.split(jax.random.key(7), T)
    pre_ops = jax.vmap(lambda k: jax.random.randint(
        jax.random.split(k)[1], (B,), 0, table.n_ops))(ka)
    pre_sels = jax.vmap(lambda k: random_actions(k).selection)(ka)

    results = {}

    # ---- rng_only ----
    def rng_only(key):
        def body(carry, _):
            key, acc = carry
            key, k = jax.random.split(key)
            a = random_actions(k)
            return (key, acc + jnp.sum(a.selection.astype(jnp.int32))
                    + jnp.sum(a.operation)), None
        (key, acc), _ = jax.lax.scan(body, (key, jnp.int32(0)), None,
                                     length=T)
        return acc
    results["rng_only_s"] = timed("rng_only", rng_only, jax.random.key(1))

    # ---- kernel_only (precomputed actions; BLK sweep) ----
    for blk in (64, 128, 256, 512):
        geom = Geom(H, W, blk)

        def kernel_only(state, ops, sels):
            def body(st, xs):
                op, sel = xs
                st2, rew, term, pending = _step_impl(
                    st, Action(selection=sel, operation=op), table,
                    flat_state=True, geom=geom)
                return st2, rew.sum()
            st, rews = jax.lax.scan(body, state, (ops, sels))
            return (jnp.sum(st.grid.astype(jnp.int32))
                    + rews.sum().astype(jnp.int32))
        try:
            t = timed(f"kernel_only[BLK={blk}]", kernel_only, state0,
                      pre_ops, pre_sels)
            results[f"kernel_only_blk{blk}_s"] = t
        except Exception as e:
            # BLK=256 exceeds the 16 MB scoped-VMEM limit (24.9 MB) —
            # record the ceiling instead of dying
            msg = str(e).splitlines()[0][:160]
            log(f"  kernel_only[BLK={blk}]: FAILED ({msg})")
            results[f"kernel_only_blk{blk}_s"] = None

    # ---- no_epilogue: RNG + mask + kernel ----
    geom = Geom(H, W, 128)

    def no_epilogue(state, key):
        def body(carry, _):
            st, key = carry
            key, k = jax.random.split(key)
            a = random_actions(k)
            st2, rew, term, pending = _step_impl(
                st, a, table, flat_state=True, geom=geom)
            return (st2, key), rew.sum()
        (st, key), rews = jax.lax.scan(body, (state, key), None, length=T)
        return (jnp.sum(st.grid.astype(jnp.int32))
                + rews.sum().astype(jnp.int32))
    results["no_epilogue_s"] = timed("no_epilogue", no_epilogue, state0,
                                     jax.random.key(2))

    # ---- full (bench.py hot path) ----
    def full(env, bs, key):
        def body(carry, _):
            bsf, key = carry
            key, k = jax.random.split(key)
            a = random_actions(k)
            bsf, _obs, rew, term, trunc = env.step_flat(bsf, a)
            return (bsf, key), rew.sum()
        (bsf, key), rews = jax.lax.scan(body, (bs, key), None, length=T)
        return (jnp.sum(bsf.env.grid.astype(jnp.int32))
                + jnp.sum(bsf.env.steps) + rews.sum().astype(jnp.int32))
    results["full_s"] = timed("full", full, env, bs_flat,
                              jax.random.key(3))

    k64 = results.get("kernel_only_blk128_s") \
        or results["kernel_only_blk64_s"]
    results["derived"] = {
        "per_step_full_us": results["full_s"] / T * 1e6,
        "per_step_kernel_us": k64 / T * 1e6,
        "per_step_rng_mask_us": results["rng_only_s"] / T * 1e6,
        "per_step_epilogue_us":
            (results["full_s"] - results["no_epilogue_s"]) / T * 1e6,
        "kernel_fraction": k64 / results["full_s"],
    }
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
