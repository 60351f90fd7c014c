"""Worker for the multi-process sharded-env test (run by
test_multihost.py, one invocation per fake host).

Builds the same global 32-env O2ARC batch on every process, shards it over
the global (2 hosts x 4 devices) mesh, runs a deterministic 10-step
rollout and prints a global checksum.  Single-process mode (nproc=1) runs
the identical computation on one 8-device host for cross-checking.
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={8 // nproc}")

import jax  # noqa: E402

if nproc > 1:
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)

import dataclasses  # noqa: E402
import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arcle_tpu.core.state import Action  # noqa: E402
from arcle_tpu.core.geometry import bbox_selection  # noqa: E402
from arcle_tpu.envs import BatchedEnv  # noqa: E402
from arcle_tpu.loaders import SyntheticLoader  # noqa: E402
from arcle_tpu.ops import o2arc_table  # noqa: E402
from arcle_tpu.parallel import make_mesh  # noqa: E402
from arcle_tpu.parallel.multihost import (  # noqa: E402
    shard_global_leading, replicate_global,
)

assert jax.device_count() == 8, jax.device_count()
mesh = make_mesh((8,), ("data",))

B, S = 32, 10
env = BatchedEnv(table=o2arc_table(max_trial=3),
                 bank=SyntheticLoader(6, seed=0).bank(), max_trial=3,
                 episode_limit=5, auto_reset=True)
bs = env.reset(jax.random.key(0), B)          # full batch, every host
bs = shard_global_leading(bs, mesh, "data")
env_g = dataclasses.replace(env, bank=replicate_global(env.bank, mesh),
                            opts=replicate_global(env.opts, mesh))


def rollout(env, bs, key):
    def body(carry, _):
        bs, key = carry
        key, ka = jax.random.split(key)
        k1, k2 = jax.random.split(ka)
        c = jax.random.randint(k1, (4, B), 0, 30)
        ops = jax.random.randint(k2, (B,), 0, 35)
        sels = jax.vmap(bbox_selection, in_axes=(0, 0, 0, 0, None, None))(
            c[0], c[1], c[2], c[3], 30, 30)
        bs, _o, rew, term, trunc = env.step(
            bs, Action(selection=sels, operation=ops))
        return (bs, key), rew.sum()

    (bs, key), rews = jax.lax.scan(body, (bs, key), None, length=S)
    chk = (jnp.sum(bs.env.grid.astype(jnp.int32)) + jnp.sum(bs.env.steps)
           + jnp.sum(rews).astype(jnp.int32))
    return chk


with mesh:
    rj = jax.jit(rollout)
    chk = int(rj(env_g, bs, jax.random.key(1)))
    # timed re-executions for the 1-vs-2-process scaling evidence
    # (compile excluded; B*S global env-steps per call)
    import time
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        chk2 = int(rj(env_g, bs, jax.random.key(1)))
        best = min(best, time.perf_counter() - t0)
print(f"CHECKSUM proc={pid} nproc={nproc} value={chk}", flush=True)
print(f"TIMING proc={pid} nproc={nproc} steps_per_s={B * S / best:.1f}",
      flush=True)
