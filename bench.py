#!/usr/bin/env python
"""Benchmark: O2ARCv2 env-steps/s at 4096 lockstep envs on one chip.

Rollout shape mirrors the training hot path: a ``lax.scan`` over T steps,
each step drawing random bbox actions on device (the BBoxWrapper action
surface, 5 ints -> selection mask) and stepping the full 35-op fused
transition with auto-reset.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "env-steps/s", "vs_baseline": N}

``vs_baseline`` is the speedup over the *reference implementation*
(ConfeitoHS/arcle, pure NumPy, single env) measured in-process on this
machine — the reference publishes no throughput numbers of its own
(SURVEY.md §6), so its measured step rate is the honest baseline.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def ensure_live_device(probe_timeout: int = 420) -> None:
    """Fail over to CPU if the TPU runtime is unreachable.

    The axon worker can be down for hours (observed); ``jax.devices()``
    then blocks forever instead of erroring, which would hang this whole
    benchmark.  Probe device contact in a subprocess with a hard timeout
    and, on failure, re-exec onto the CPU platform with a cleaned
    environment so the run still emits its JSON line (flagged
    ``tpu_unavailable`` via env for the result dict)."""
    import os
    import subprocess
    if os.environ.get("ARCLE_BENCH_CPU_FALLBACK"):
        return
    probe_timeout = int(os.environ.get("ARCLE_BENCH_PROBE_TIMEOUT",
                                       probe_timeout))
    probe = ("import jax, jax.numpy as jnp;"
             "print(float((jnp.ones((8,8))@jnp.ones((8,8))).sum()))")
    for attempt in range(3):
        # retry: a saturated tunnel (several live clients) can time one
        # probe out without the worker being down
        try:
            subprocess.run([sys.executable, "-c", probe], check=True,
                           timeout=probe_timeout,
                           stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL)
            return
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            log(f"device probe failed/timed out "
                f"({probe_timeout}s, attempt {attempt + 1}/3)")
    log("re-executing on CPU fallback")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)         # drops the axon sitecustomize
    env["JAX_PLATFORMS"] = "cpu"
    env["ARCLE_BENCH_CPU_FALLBACK"] = "1"
    os.execve(sys.executable, [sys.executable] + sys.argv, env)


def bench_reference_numpy(n_steps: int = 3000, seed: int = 0) -> float:
    """Step rate of the reference env (fallback: the validated oracle)."""
    rng = np.random.default_rng(seed)
    inp = rng.integers(0, 10, (12, 12)).astype(np.int8)
    out = rng.integers(0, 10, (12, 12)).astype(np.int8)

    def random_action():
        x1, x2 = sorted(rng.integers(0, 30, 2).tolist())
        y1, y2 = sorted(rng.integers(0, 30, 2).tolist())
        sel = np.zeros((30, 30), np.int8)
        sel[x1:x2 + 1, y1:y2 + 1] = 1
        return sel, int(rng.integers(0, 35))

    try:
        sys.path.insert(0, "/root/reference")
        from arcle.envs.o2arcenv import O2ARCv2Env as RefEnv
        from arcle.loaders import Loader

        class OneTask(Loader):
            def get_path(self, **kw):
                return ["<mem>"]

            def parse(self, **kw):
                return [([inp], [out], [inp], [out], {"id": "bench"})]

        env = RefEnv(data_loader=OneTask(), max_trial=-1)
        env.reset(options={"prob_index": 0, "subprob_index": 0})
        t0 = time.perf_counter()
        done_steps = 0
        while done_steps < n_steps:
            sel, op = random_action()
            _, _, term, _, _ = env.step({"selection": sel, "operation": op})
            done_steps += 1
            if term:
                env.reset(options={"prob_index": 0, "subprob_index": 0})
        dt = time.perf_counter() - t0
        log(f"reference numpy single-env: {done_steps / dt:,.0f} steps/s")
        return done_steps / dt
    except Exception as e:  # pragma: no cover
        log(f"reference not runnable ({e}); using NumPy oracle as baseline")
        from arcle_tpu.oracle import OracleEnv
        env = OracleEnv("o2arc", max_trial=-1)
        env.reset(inp, out)
        t0 = time.perf_counter()
        for _ in range(n_steps):
            sel, op = random_action()
            _, _, term = env.step(sel, op)
            if term:
                env.reset(inp, out)
        dt = time.perf_counter() - t0
        log(f"oracle numpy single-env: {n_steps / dt:,.0f} steps/s")
        return n_steps / dt


def bench_tpu(batch: int, steps: int, iters: int, seed: int = 0,
              table=None, bank=None, point_actions: bool = False,
              util_out: dict = None) -> float:
    import jax
    import jax.numpy as jnp
    from arcle_tpu.core.state import Action
    from arcle_tpu.core.geometry import bbox_selection, point_selection
    from arcle_tpu.envs import BatchedEnv
    from arcle_tpu.loaders import SyntheticLoader
    from arcle_tpu.ops import o2arc_table
    from arcle_tpu.benchmarks import roofline

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")

    if table is None:
        table = o2arc_table(max_trial=-1)
    if bank is None:
        bank = SyntheticLoader(16, seed=3).bank()

    def builder(use_pallas):
        return BatchedEnv(table=table, bank=bank,
                          max_trial=-1, episode_limit=100, auto_reset=True,
                          use_pallas=use_pallas,
                          # pre-drawn reset pool: auto-reset inside the
                          # scan is a row gather instead of a fresh
                          # sample+init (the same mechanism run_ppo uses)
                          reset_pool=8)

    # the megakernel is table-generic (raw/arc parity fuzzed in
    # tests/test_pallas_step.py); engine choice is MEASURED per
    # (table, batch) — the round-3 batch-size heuristic mispicked
    # (raw@256: XLA 667k vs Pallas 504k)
    use_pallas = roofline.pick_engine(builder, batch)
    log(f"pallas megakernel: {use_pallas} (measured pick)")
    env = builder(use_pallas)

    H = W = 30

    from arcle_tpu.core.geometry import bbox_selection_flat, \
        point_selection_flat

    def random_actions(key, n_ops, flat):
        k1, k2 = jax.random.split(key)
        ops = jax.random.randint(k2, (batch,), 0, n_ops)
        if point_actions:
            corners = jax.random.randint(k1, (2, batch), 0, H)
            builder = point_selection_flat if flat else point_selection
            sels = jax.vmap(builder, in_axes=(0, 0, None, None))(
                corners[0], corners[1], H, W)
        else:
            corners = jax.random.randint(k1, (4, batch), 0, H)
            builder = bbox_selection_flat if flat else bbox_selection
            sels = jax.vmap(builder, in_axes=(0, 0, 0, 0, None, None))(
                corners[0], corners[1], corners[2], corners[3], H, W)
        return Action(selection=sels, operation=ops)

    # NOTE: the env rides through jit as an explicit pytree argument —
    # closing over device arrays is pathological on the axon runtime
    # (see BatchedEnv docstring).
    from arcle_tpu.envs.core import flatten_grids, unflatten_grids

    # pallas path: fully-flat carries + flat actions through step_flat (no
    # relayout copies per step); XLA path: flat carries, square step
    def rollout(env, bs, key):
        def body(carry, _):
            bs_flat, key = carry
            key, ka = jax.random.split(key)
            if use_pallas:
                act = random_actions(ka, env.table.n_ops, True)
                bs_flat, _obs, rew, term, trunc = env.step_flat(bs_flat, act)
            else:
                b = unflatten_grids(bs_flat)
                act = random_actions(ka, env.table.n_ops, False)
                b, _obs, rew, term, trunc = env.step(b, act)
                bs_flat = flatten_grids(b)
            return (bs_flat, key), rew.sum()

        (bs_flat, key), rews = jax.lax.scan(
            body, (flatten_grids(bs), key), None, length=steps)
        bs = unflatten_grids(bs_flat)
        # scalar checksum over the final carry: forcing its host readback is
        # the only reliable completion barrier on the axon runtime
        # (block_until_ready returns before the work drains there)
        chk = (jnp.sum(bs.env.grid.astype(jnp.int32)) + jnp.sum(bs.env.steps)
               + rews.sum().astype(jnp.int32))
        return bs, key, chk

    rollout_j = jax.jit(rollout)

    key = jax.random.key(seed)
    bs = env.reset(key, batch)
    t0 = time.perf_counter()
    bs, key, chk = rollout_j(env, bs, key)
    chk = int(chk)
    log(f"compile + first rollout: {time.perf_counter() - t0:.1f}s")

    best = 0.0
    for it in range(iters):
        t0 = time.perf_counter()
        bs, key, chk = rollout_j(env, bs, key)
        chk = int(chk)   # host readback = completion barrier
        dt = time.perf_counter() - t0
        rate = batch * steps / dt
        log(f"iter {it}: {rate:,.0f} env-steps/s ({dt * 1e3:.1f} ms "
            f"for {batch}x{steps}, chk={chk})")
        best = max(best, rate)

    if util_out is not None:
        # roofline accounting: XLA cost model of the whole compiled
        # rollout + the analytic megakernel traffic model, as % of the
        # chip's HBM/MXU peaks at the measured rate
        try:
            from arcle_tpu.benchmarks import roofline as _rf
            cost = _rf.cost_from_compiled(
                jax.jit(rollout).lower(env, bs, key).compile())
            analytic = (_rf.pallas_step_bytes(table, batch) if use_pallas
                        else None)
            util_out.update(_rf.summarize(best, batch, steps, cost,
                                          analytic))
            util_out["engine"] = "pallas" if use_pallas else "xla"
            # measured binding resource (docs/engine_bind_r5.txt): the
            # kernel is 82% of the step, per-step HBM traffic is KBs,
            # and block scaling stops at the 16 MB scoped-VMEM ceiling
            # (BLK=256 fails to compile) — low HBM% here is expected,
            # not headroom
            util_out["bind"] = "vpu-compute/scoped-vmem"
            log(f"roofline: {util_out}")
        except Exception as e:  # pragma: no cover
            log(f"roofline accounting failed: {e}")
    return best


def bench_scaling(batch_per_device: int, steps: int):
    """Sharded-throughput harness: same per-device env batch, increasing
    device counts; reports steps/s/device and scaling efficiency.  On this
    single-chip host it exercises the mechanism over the virtual CPU mesh
    (JAX_PLATFORMS=cpu + --xla_force_host_platform_device_count); on a pod
    slice it measures the real ICI numbers (env stepping needs no
    cross-device communication, so efficiency should be ~100%)."""
    import jax
    import jax.numpy as jnp
    from arcle_tpu.core.state import Action
    from arcle_tpu.core.geometry import bbox_selection
    from arcle_tpu.envs import BatchedEnv
    from arcle_tpu.loaders import SyntheticLoader
    from arcle_tpu.ops import o2arc_table
    from arcle_tpu.parallel import make_mesh, shard_leading

    env = BatchedEnv(table=o2arc_table(max_trial=-1),
                     bank=SyntheticLoader(16, seed=3).bank(),
                     max_trial=-1, episode_limit=100, auto_reset=True)
    n_dev = len(jax.devices())
    base_rate = None
    results = {}
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_dev]
    for n in counts:
        mesh = make_mesh((n,), ("data",), devices=jax.devices()[:n])
        B = batch_per_device * n

        def random_actions(key):
            k1, k2 = jax.random.split(key)
            c = jax.random.randint(k1, (4, B), 0, 30)
            ops = jax.random.randint(k2, (B,), 0, env.table.n_ops)
            sels = jax.vmap(bbox_selection,
                            in_axes=(0, 0, 0, 0, None, None))(
                c[0], c[1], c[2], c[3], 30, 30)
            return Action(selection=sels, operation=ops)

        def rollout(env, bs, key):
            def body(carry, _):
                bs, key = carry
                key, ka = jax.random.split(key)
                bs, _o, rew, term, trunc = env.step(bs, random_actions(ka))
                return (bs, key), rew.sum()
            (bs, key), r = jax.lax.scan(body, (bs, key), None, length=steps)
            chk = jnp.sum(bs.env.grid.astype(jnp.int32)) + jnp.sum(bs.env.steps)
            return bs, chk

        bs = shard_leading(env.reset(jax.random.key(0), B), mesh, "data")
        env_s = shard_leading(env, mesh, "data")
        with mesh:
            rj = jax.jit(rollout)
            out = rj(env_s, bs, jax.random.key(1)); _ = int(out[1])
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                out = rj(env_s, out[0], jax.random.key(2)); _ = int(out[1])
                best = min(best, time.perf_counter() - t0)
        rate = B * steps / best
        per_dev = rate / n
        if base_rate is None:
            base_rate = per_dev
        eff = per_dev / base_rate * 100
        results[n] = (rate, eff)
        log(f"devices={n}: {rate:,.0f} steps/s total, "
            f"{per_dev:,.0f}/device, efficiency {eff:.1f}%")
    return results


def bench_single_env_adapter(n_steps: int = 30000, seed: int = 0) -> float:
    """BASELINE config 1 the way a *user* runs it: the gym adapter
    (``RawARCEnv`` + MiniARC loader) stepped one action at a time — the
    same surface `bench_reference_numpy` measures on the reference.  The
    adapter routes B=1 through the native C++ engine (bit-exact vs the
    oracle, tests/test_native_engine.py), so the interactive path beats
    the reference instead of paying per-step device dispatch."""
    import numpy as _np
    from arcle_tpu.envs.gym_compat import RawARCEnv
    from arcle_tpu.loaders import MiniARCLoader

    rng = _np.random.default_rng(seed)
    env = RawARCEnv(data_loader=MiniARCLoader(), max_trial=-1)
    env.reset(seed=seed, options={"prob_index": 0, "subprob_index": 0})
    n_ops = len(env.operations)
    log(f"single-env adapter backend: "
        f"{'native' if env._native is not None else 'jax'}")
    t0 = time.perf_counter()
    done = 0
    while done < n_steps:
        x1, x2 = sorted(rng.integers(0, 30, 2).tolist())
        y1, y2 = sorted(rng.integers(0, 30, 2).tolist())
        sel = np.zeros((30, 30), np.int8)
        sel[x1:x2 + 1, y1:y2 + 1] = 1
        _, _, term, _, _ = env.step(
            {"selection": sel, "operation": int(rng.integers(0, n_ops))})
        done += 1
        if term:
            env.reset(options={"prob_index": 0, "subprob_index": 0})
    rate = done / (time.perf_counter() - t0)
    log(f"single-env gym adapter: {rate:,.0f} steps/s")
    return rate


def bench_baseline_configs(steps: int) -> dict:
    """BASELINE.json configs 1-3 (Raw@1 and @256, ARCEnv+Point@1024) plus
    the reset/auto-reset gather cost on a reference-scale (~3200-pair)
    TaskBank at 4096 envs."""
    import tempfile
    import time as _time

    import jax
    import jax.numpy as jnp
    from arcle_tpu.envs import BatchedEnv
    from arcle_tpu.loaders import ARCLoader, MiniARCLoader
    from arcle_tpu.loaders.synthetic import write_corpus
    from arcle_tpu.ops import raw_table, arc_table, o2arc_table

    out = {}
    mini_bank = MiniARCLoader().bank()
    # config 1: RawARCEnv + MiniARCLoader, 1 env — the interactive gym
    # surface (native C++ engine at B=1)
    out["raw_miniarc_1env"] = round(bench_single_env_adapter())
    # config 2: RawARCEnv + ARC-format corpus, 256 envs
    with tempfile.TemporaryDirectory() as td:
        t0 = _time.perf_counter()
        n_pairs = write_corpus(td, n_tasks=400, n_train=6, n_test=2)
        arc_bank = ARCLoader(root=td).bank()
        log(f"400-task corpus ({n_pairs} pairs) generated+baked in "
            f"{_time.perf_counter() - t0:.1f}s")
    out["raw_arc_256env"] = round(bench_tpu(
        256, steps, 2, table=raw_table(max_trial=-1), bank=arc_bank))
    # config 3: ARCEnv intent (27 ops) + PointWrapper, 1024 envs
    out["arc_point_1024env"] = round(bench_tpu(
        1024, steps, 2, table=arc_table(max_trial=-1), bank=arc_bank,
        point_actions=True))
    # reset/auto-reset gather cost at 4096 envs on the ~3200-pair bank
    from arcle_tpu.envs.core import reset_jit
    env = BatchedEnv(table=o2arc_table(max_trial=-1), bank=arc_bank,
                     max_trial=-1, episode_limit=100, auto_reset=True)

    # the readback program must be warmed too: through the TPU relay a
    # cold `sum(astype(x))` costs a remote compile (~0.4 s) that the r4
    # bench accidentally timed INSIDE the reset window — the source of
    # the 450 ms-vs-26 ms contradiction in the round-4 verdict (weak #2)
    def _consume(bs):
        return int(jnp.sum(bs.env.input_dim.astype(jnp.int32)))

    bs = reset_jit(env, jax.random.key(0), 4096)   # compile + warm
    _ = _consume(bs)
    best = float("inf")
    for i in range(3):
        t0 = _time.perf_counter()
        bs = reset_jit(env, jax.random.key(1 + i), 4096)
        _ = _consume(bs)
        best = min(best, _time.perf_counter() - t0)
    out["reset_4096env_3200pair_ms"] = round(best * 1e3, 1)
    # the eager path for the record (what a naive caller pays per reset)
    t0 = _time.perf_counter()
    bs2 = env.reset(jax.random.key(2), 4096)
    _ = int(jnp.sum(bs2.env.steps))
    out["reset_4096env_eager_ms"] = round(
        (_time.perf_counter() - t0) * 1e3, 1)
    out["corpus_pairs"] = n_pairs
    log(f"baseline configs: {out}")
    return out


def bench_train_loop(batch: int, steps: int, iters: int = 3) -> float:
    """The BASELINE north-star configuration: B lockstep O2ARC envs with
    dense reward + augmentation *feeding a PPO learner* — one fused jitted
    iteration (rollout with the MLP policy + GAE + full-batch update),
    exactly what run_ppo executes.  Returns env-steps/s including the
    learner."""
    import time as _time

    import jax
    import jax.numpy as jnp
    from arcle_tpu.envs import BatchedEnv
    from arcle_tpu.loaders import SyntheticLoader
    from arcle_tpu.ops import o2arc_table
    from arcle_tpu.models.mlp import FCPolicy
    from arcle_tpu.training.agents import mlp_agent
    from arcle_tpu.training.ppo import (
        PPOConfig, batch_from_trajectory, make_optimizer, train_step)
    from arcle_tpu.training.rollout import rollout

    use_pallas = jax.devices()[0].platform == "tpu" and batch % 64 == 0
    env = BatchedEnv(table=o2arc_table(127, crop_at_33=True),
                     bank=SyntheticLoader(32, seed=7).bank(), max_trial=127,
                     episode_limit=100, auto_reset=True, dense_reward=True,
                     augment=True, use_pallas=use_pallas, reset_pool=8)
    agent = mlp_agent(FCPolicy(hidden=(1024, 1024, 512, 512, 256, 128),
                               n_ops=env.table.n_ops))
    cfg = PPOConfig()
    key = jax.random.key(0)
    key, ki, kr = jax.random.split(key, 3)
    bs = env.reset(kr, batch)
    params = agent.init_fn(ki, agent.obs_fn(
        jax.tree.map(lambda x: x[:1], bs.env)))
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)

    def iteration(env, bs, params, opt_state, key):
        key, kroll, ktrain = jax.random.split(key, 3)
        bs, traj, last_v = rollout(env, bs, params, kroll, steps, agent)
        batch_ = batch_from_trajectory(traj, last_v, cfg)
        params, opt_state, stats = train_step(
            params, opt_state, batch_, ktrain, agent, tx, cfg)
        return bs, params, opt_state, key, stats["total_loss"] + 0.0

    it_j = jax.jit(iteration)
    out = it_j(env, bs, params, opt_state, key)
    _ = float(out[-1])                  # compile + readback barrier
    best = 1e9
    for _i in range(iters):
        t0 = _time.perf_counter()
        out = it_j(env, bs, out[1], out[2], out[3])
        _ = float(out[-1])
        best = min(best, _time.perf_counter() - t0)
    rate = batch * steps / best
    log(f"ppo train loop: {best * 1e3:.1f} ms/iter -> {rate:,.0f} "
        f"env-steps/s incl. learner")
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--ref-steps", type=int, default=3000)
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--headline-only", action="store_true",
                    help="skip the BASELINE configs 1-3 sweep")
    ap.add_argument("--scaling", action="store_true",
                    help="multi-device scaling harness instead of the "
                         "single-chip benchmark")
    args = ap.parse_args()

    # persistent XLA-executable cache (user-scoped; honors
    # JAX_COMPILATION_CACHE_DIR): repeat bench runs skip the multi-minute
    # remote compiles of the rollout programs
    import os
    import tempfile
    cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(tempfile.gettempdir(),
                     f"arcle_bench_cache_{os.getuid()}"))
    try:
        os.makedirs(cache, exist_ok=True)
        import jax
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    except Exception as e:
        log(f"compile cache disabled: {e}")

    if not args.scaling:
        ensure_live_device()

    if args.scaling:
        results = bench_scaling(max(args.batch // 8, 64), min(args.steps, 20))
        n = max(results)
        rate, eff = results[n]
        print(json.dumps({
            "metric": f"O2ARCv2 sharded env-steps/s @ {n} devices",
            "value": round(rate), "unit": "env-steps/s",
            "vs_baseline": round(eff, 1),
        }))
        return

    if args.skip_ref:
        ref_rate = 1.0
    else:
        ref_rate = bench_reference_numpy(args.ref_steps)

    util = {}
    rate = bench_tpu(args.batch, args.steps, args.iters, util_out=util)

    result = {
        "metric": f"O2ARCv2 env-steps/s @ {args.batch} lockstep envs "
                  f"(random bbox actions, auto-reset)",
        "value": round(rate),
        "unit": "env-steps/s",
        "vs_baseline": round(rate / ref_rate, 2),
    }
    if util:
        result["roofline"] = util
    import os as _os
    if _os.environ.get("ARCLE_BENCH_CPU_FALLBACK"):
        result["tpu_unavailable"] = True    # CPU-fallback numbers: the
        # TPU runtime was unreachable past the probe timeout
    if not args.headline_only:
        try:
            result["configs"] = bench_baseline_configs(min(args.steps, 100))
        except Exception as e:  # pragma: no cover
            log(f"baseline-config sweep failed: {e}")
        try:
            # the BASELINE north star: envs *feeding a PPO learner*
            result["ppo_train_loop_steps_per_s"] = round(
                bench_train_loop(args.batch, args.steps))
        except Exception as e:  # pragma: no cover
            log(f"train-loop bench failed: {e}")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
