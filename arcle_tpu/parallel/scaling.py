"""Scaling-efficiency evidence for the DP learner (BASELINE: >=80 % at
N>=2 hosts).

Three layers of evidence, from measured to modeled:

1. ``measure_ppo_scaling`` — the FULL training iteration (on-device
   rollout through the batched env + GPT policy + PPO update with the
   gradient ``psum`` XLA inserts from the shardings) timed on 1/2/4/8
   virtual-device CPU meshes, fixed per-device env batch (weak scaling).
   On a single host all virtual devices share the same cores, so the
   absolute efficiency numbers measure *host core contention*, not ICI —
   they prove the sharded path executes and bound collective overhead
   from above.

2. ``fit_allreduce`` — least-squares fit of the ring-all-reduce cost
   model  T(d) = t_comp + t_ring * (d-1)/d  to the measured sweep.
   ``t_ring`` is an upper bound on (collective + contention) cost per
   step on this host.

3. ``project_multihost`` — analytic projection on real interconnect
   numbers.  The only cross-host traffic in the whole design is the
   gradient all-reduce (env stepping is embarrassingly parallel over the
   batch axis — no collectives; SURVEY §2.6/§5).  A ring all-reduce of
   G gradient bytes moves 2*(N-1)/N * G per host per update; against the
   *measured real-chip* update period (bench.py ppo train loop,
   BENCH_r03: 348.4 ms at 4096 envs x 100 steps) that yields the
   projected N-host efficiency reported by ``dryrun_multichip``.

Interconnect constants (order-of-magnitude, public "How to Scale Your
Model" hardware tables): v5e ICI ~4.5e10 B/s/dir/axis; inter-host DCN
~6.25e9 B/s per host (50 Gb/s NIC) — DCN is the pessimistic (slowest)
path, so the projection below uses it for every host boundary.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional, Sequence

import numpy as np

ICI_BW = 4.5e10      # bytes/s per direction per axis, v5e
DCN_BW = 6.25e9      # bytes/s per host, 50 Gb/s NIC


def _build_train_iter(mesh, per_device_envs: int, T: int, n_layer: int):
    """Data-parallel full PPO iteration (rollout + learner) on ``mesh``;
    returns (jitted_fn, env, carry, env_steps_per_iter, n_params).

    Uses the 5x5 answer-given benchmark stack (transformer policy + real
    batched env) so the sweep compiles and runs inside a CI budget on the
    virtual CPU mesh; the DP structure — env batch sharded over ``data``,
    params replicated, gradient ``psum`` inserted by XLA — is identical
    to the flagship 30x30 configuration."""
    import jax

    from ..benchmarks.answer_given import (
        answer_given_agent, answer_given_env, make_policy,
    )
    from ..training import (
        PPOConfig, batch_from_trajectory, make_optimizer, rollout,
        train_step,
    )
    from .mesh import shard_leading

    n_data = mesh.shape["data"]
    B = per_device_envs * n_data
    cfg = PPOConfig(n_epochs=1, n_minibatches=1)
    model = make_policy(h=5, w=5, n_layer=n_layer)
    agent = answer_given_agent(model)

    env = answer_given_env(n_tasks=64, seed=0, episode_limit=10)
    bs = env.reset(jax.random.key(0), B)
    params = agent.init_fn(
        jax.random.key(1),
        agent.obs_fn(jax.tree.map(lambda x: x[:1], bs.env)))
    tx = make_optimizer(cfg)
    opt_state = tx.init(params)
    bs = shard_leading(bs, mesh, "data")

    def train_iter(env, bs, params, opt_state, key):
        key, kr, kt = jax.random.split(key, 3)
        bs, traj, last_v = rollout(env, bs, params, kr, T, agent)
        batch = batch_from_trajectory(traj, last_v, cfg)
        params, opt_state, stats = train_step(
            params, opt_state, batch, kt, agent, tx, cfg)
        return bs, params, opt_state, key, stats["total_loss"]

    n_params = sum(int(x.size) for x in jax.tree.leaves(params))
    carry = (bs, params, opt_state, jax.random.key(2))
    return train_iter, env, carry, B * T, n_params


def measure_ppo_scaling(device_counts: Sequence[int] = (1, 2, 4, 8),
                        per_device_envs: int = 8, T: int = 8,
                        iters: int = 3, n_layer: int = 2,
                        budget_s: Optional[float] = None):
    """Weak-scaling sweep of the full PPO iteration over virtual-device
    meshes.  Returns [{devices, steps_per_s, per_device, efficiency}].

    ``budget_s`` bounds the sweep's wall clock: each mesh costs a fresh
    XLA compile (~1 min cold on the CPU backend), so a driver running
    this behind a timeout gets the counts that fit the budget plus a
    truncation notice instead of a hard kill mid-sweep.  The check
    estimates the NEXT mesh's cost from the last one (compile + measure
    scale roughly with device count on the shared-core backend) and skips
    preemptively, so callers may set budget_s equal to an external
    timeout minus a few seconds rather than leaving a whole-mesh
    headroom."""
    import jax

    from .mesh import make_mesh

    n_dev = len(jax.devices())
    rows = []
    base = None
    t_start = time.perf_counter()
    t_last_mesh = 0.0
    wanted = [d for d in device_counts if d <= n_dev]
    for d in wanted:
        if (budget_s is not None and rows
                and time.perf_counter() - t_start + t_last_mesh
                > budget_s):
            print(f"scaling: budget {budget_s:.0f}s exhausted after "
                  f"devices={rows[-1]['devices']}; skipping "
                  f"{[x for x in wanted if x > rows[-1]['devices']]}")
            break
        t_mesh0 = time.perf_counter()
        mesh = make_mesh((d,), ("data",), devices=jax.devices()[:d])
        fn, env, carry, steps_per_iter, n_params = _build_train_iter(
            mesh, per_device_envs, T, n_layer)
        with mesh:
            jit_fn = jax.jit(fn)
            out = jit_fn(env, *carry)
            _ = float(out[-1])                      # compile + warm
            best = float("inf")
            for _ in range(iters):
                t0 = time.perf_counter()
                out = jit_fn(env, *out[:-1])
                _ = float(out[-1])                  # readback barrier
                best = min(best, time.perf_counter() - t0)
        rate = steps_per_iter / best
        per_dev = rate / d
        if base is None:
            base = per_dev
        rows.append({"devices": d, "iter_s": best,
                     "steps_per_s": rate, "per_device": per_dev,
                     "efficiency": per_dev / base,
                     "n_params": n_params})
        t_last_mesh = time.perf_counter() - t_mesh0
    return rows


def fit_allreduce(rows):
    """Least-squares fit of T(d) = t_comp + t_ring*(d-1)/d to the sweep.
    Under weak scaling t_comp is the per-step compute at fixed per-device
    work; t_ring upper-bounds collective (+ host contention) cost."""
    d = np.array([r["devices"] for r in rows], dtype=np.float64)
    t = np.array([r["iter_s"] for r in rows], dtype=np.float64)
    X = np.stack([np.ones_like(d), (d - 1.0) / d], axis=1)
    coef, *_ = np.linalg.lstsq(X, t, rcond=None)
    t_comp, t_ring = float(coef[0]), float(coef[1])
    if t_comp < 0.0:
        # contention-dominated sweep (virtual devices oversubscribe the
        # host cores): pin compute to the single-device measurement and
        # attribute the rest to the ring term
        t_comp = float(t[d == 1.0][0]) if np.any(d == 1.0) else 0.0
        r = (d - 1.0) / d
        t_ring = float(np.sum(r * (t - t_comp)) / np.sum(r * r))
    return {"t_comp_s": t_comp, "t_ring_s": max(t_ring, 0.0)}


def project_multihost(n_params: int, update_period_s: float,
                      hosts: Sequence[int] = (2, 4, 8, 16),
                      bw: float = DCN_BW):
    """Projected N-host DP efficiency: the only cross-host traffic is the
    gradient ring all-reduce (2*(N-1)/N * 4*n_params bytes per host per
    update) riding DCN; env stepping crosses no host boundary."""
    g_bytes = 4.0 * n_params
    out = []
    for n in hosts:
        t_comm = 2.0 * (n - 1) / n * g_bytes / bw
        eff = update_period_s / (update_period_s + t_comm)
        out.append({"hosts": n, "grad_mb": g_bytes / 1e6,
                    "t_comm_ms": t_comm * 1e3, "efficiency": eff})
    return out


def validate_allreduce_model(n_params: int, probe_mb: float = 1.0,
                             timeout_s: float = 300.0) -> Optional[dict]:
    """Predicted-vs-measured all-reduce on the model's own testbed.

    The multi-host projection rests on the ring-all-reduce cost model
    ``t = 2*(N-1)/N * G / bw``.  This validates the model's *structure*
    against the only cross-process channel available on one machine (the
    Gloo backend the multi-host tests use, tests/multihost_worker.py):

    1. measure a 2-process 1-device-each ``psum`` at a small probe size
       and at the flagship gradient size, in isolation;
    2. fit the channel bandwidth from the probe point via the model;
    3. *predict* the gradient-size time from that fit and compare with
       the measurement.

    A prediction within ~2x validates the linear-in-bytes ring model on
    a real collective; the absolute Gloo/TCP bandwidth says nothing
    about DCN (the projection's sensitivity rows cover that axis).
    Returns None when the 2-process run cannot be executed here.
    """
    import socket
    import subprocess
    import sys

    grad_mb = 4.0 * n_params / 1e6
    probe2_mb = 4.0 * probe_mb
    sizes = f"{probe_mb},{probe2_mb},{grad_mb:.6f}"
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    # the axon site hook would re-point the workers at the (single) real
    # TPU; this measurement is about the Gloo CPU channel
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon_site" not in p)
    try:
        procs = [subprocess.Popen(
            [sys.executable, "-m", "arcle_tpu.parallel.psum_worker",
             str(pid), "2", str(port), sizes], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
            for pid in range(2)]
        outs = [p.communicate(timeout=timeout_s) for p in procs]
    except Exception as e:
        for p in procs:
            p.kill()
        print(f"allreduce validation skipped: {e}")
        return None
    if any(p.returncode != 0 for p in procs):
        print("allreduce validation skipped: worker failed: "
              + outs[0][1][-500:])
        return None
    times = None
    for so, _ in outs:
        for line in so.splitlines():
            if line.startswith("PSUM_TIMES "):
                times = json.loads(line[len("PSUM_TIMES "):])
    if not times:
        return None
    t1, t2 = times[str(probe_mb)], times[str(probe2_mb)]
    t_grad = times[f"{grad_mb:.6f}"]

    # model: t = t_lat + 2*(N-1)/N * G/bw ; N=2 -> t = t_lat + G/bw.
    # Two probe points pin (t_lat, bw); the gradient-size time is then a
    # genuine out-of-sample prediction of the ring model on this channel.
    bw_fit = (probe2_mb - probe_mb) * 1e6 / max(t2 - t1, 1e-9)
    t_lat = max(t1 - probe_mb * 1e6 / bw_fit, 0.0)
    predicted = t_lat + grad_mb * 1e6 / bw_fit
    return {"probe_mb": [probe_mb, probe2_mb], "probe_s": [t1, t2],
            "grad_mb": grad_mb, "measured_s": t_grad,
            "fitted_bw_gbps": bw_fit / 1e9, "fitted_latency_ms":
                t_lat * 1e3,
            "predicted_s": predicted,
            "ratio_pred_over_meas": predicted / t_grad}


def flagship_n_params() -> int:
    """Parameter count of the flagship 8L/16H/128E GPT policy (the model
    whose gradients the multi-host projection must move) — counted from
    the module shapes without running a forward pass."""
    import jax

    from ..envs import BatchedEnv
    from ..loaders import SyntheticLoader
    from ..models.gpt import GPTPolicy, GPTConfig
    from ..ops import o2arc_table
    from ..training import gpt_agent

    env = BatchedEnv(table=o2arc_table(max_trial=3),
                     bank=SyntheticLoader(1, seed=0).bank(), max_trial=3,
                     episode_limit=10, auto_reset=True)
    bs = env.reset(jax.random.key(0), 1)
    agent = gpt_agent(GPTPolicy(GPTConfig()))
    shapes = jax.eval_shape(agent.init_fn, jax.random.key(1),
                            agent.obs_fn(bs.env))
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes))


def real_update_period_s(default: float = 0.3484) -> float:
    """Measured real-chip PPO update period: read the latest committed
    bench artifact if present (ppo train loop, 4096 envs x 100 steps),
    else the BENCH_r03 value."""
    root = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    best = default
    for name in sorted(os.listdir(root)):
        if name.startswith("BENCH_r") and name.endswith(".json"):
            try:
                with open(os.path.join(root, name)) as f:
                    rec = json.load(f)
                rate = rec.get("parsed", rec).get(
                    "ppo_train_loop_steps_per_s")
                if rate:
                    best = 4096 * 100 / float(rate)
            except Exception:
                pass
    return best


def scaling_report(device_counts=(1, 2, 4, 8), per_device_envs: int = 8,
                   T: int = 8, n_layer: int = 2,
                   budget_s: Optional[float] = None) -> dict:
    """Measured sweep + fit + projection; prints the table and the
    efficiency-vs-target statement (consumed from dryrun_multichip so the
    driver's MULTICHIP artifact records it)."""
    if budget_s is None:
        budget_s = float(os.environ.get("ARCLE_SCALING_BUDGET_S", "240"))
    rows = measure_ppo_scaling(device_counts, per_device_envs, T,
                               n_layer=n_layer, budget_s=budget_s)
    fit = (fit_allreduce(rows) if len(rows) >= 2
           else {"t_comp_s": rows[0]["iter_s"] if rows else 0.0,
                 "t_ring_s": None})
    n_params = flagship_n_params()
    period = real_update_period_s()
    proj = project_multihost(n_params, period)
    # sensitivity of the projection to the assumed DCN bandwidth: the
    # 6.25 GB/s constant is a NIC spec, not a measurement — report the
    # worst-host efficiency across a 1 GB/s .. 25 GB/s band too
    sens = []
    for bw in (1e9, DCN_BW, 25e9):
        p = project_multihost(n_params, period, bw=bw)
        sens.append({"bw_gbps": bw / 1e9,
                     "worst_eff": min(x["efficiency"] for x in p),
                     "eff_16_hosts": p[-1]["efficiency"]})
    val = validate_allreduce_model(n_params)

    print("scaling: full PPO iteration (rollout+learner), weak scaling, "
          f"{per_device_envs} envs/device x T={T} (virtual CPU devices "
          "share host cores - absolute efficiency measures core "
          "contention, not ICI):")
    for r in rows:
        print(f"  devices={r['devices']}: {r['steps_per_s']:,.0f} "
              f"steps/s total, {r['per_device']:,.0f}/device, "
              f"efficiency {r['efficiency'] * 100:.1f}%")
    if fit["t_ring_s"] is None:
        print("scaling fit: skipped - sweep truncated to a single row "
              "(no multi-device point to fit the ring term against)")
    else:
        print(f"scaling fit T(d)=t_comp+t_ring*(d-1)/d: "
              f"t_comp={fit['t_comp_s'] * 1e3:.1f}ms "
              f"t_ring<={fit['t_ring_s'] * 1e3:.1f}ms "
              "(upper bound: includes host core contention)")
    print(f"projection: grad all-reduce {proj[0]['grad_mb']:.1f} MB/update "
          f"({n_params:,} params) over DCN {DCN_BW / 1e9:.2f} GB/s vs "
          f"measured real-chip update period {period * 1e3:.1f} ms "
          "(bench.py ppo train loop, 4096 envs x 100 steps):")
    for p in proj:
        print(f"  hosts={p['hosts']}: t_comm={p['t_comm_ms']:.2f}ms, "
              f"projected efficiency {p['efficiency'] * 100:.2f}%")
    print("projection sensitivity to the assumed DCN bandwidth "
          "(worst-host / 16-host efficiency):")
    for s in sens:
        print(f"  bw={s['bw_gbps']:.2f} GB/s: "
              f"{s['worst_eff'] * 100:.2f}% / {s['eff_16_hosts'] * 100:.2f}%")
    if val is not None:
        print(f"collective validation (2-process Gloo psum, isolated): "
              f"probes {val['probe_mb']} MB -> "
              f"bw={val['fitted_bw_gbps']:.2f} GB/s + "
              f"{val['fitted_latency_ms']:.2f} ms latency; model "
              f"predicts {val['predicted_s'] * 1e3:.1f} ms for the "
              f"{val['grad_mb']:.1f} MB gradient, measured "
              f"{val['measured_s'] * 1e3:.1f} ms "
              f"(pred/meas = {val['ratio_pred_over_meas']:.2f})")
    worst = min(p["efficiency"] for p in proj)
    verdict = "MEETS" if worst >= 0.80 else "MISSES"
    print(f"scaling statement: projected multi-host DP efficiency "
          f">={worst * 100:.2f}% at up to {max(p['hosts'] for p in proj)} "
          f"hosts - {verdict} the BASELINE >=80% @ N>=2 hosts target "
          "(env stepping crosses no host boundary; the gradient "
          "all-reduce is the only inter-host traffic).")
    return {"sweep": rows, "fit": fit, "n_params": n_params,
            "update_period_s": period, "projection": proj,
            "bw_sensitivity": sens, "collective_validation": val,
            "meets_target": worst >= 0.80}
