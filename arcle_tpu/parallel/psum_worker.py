"""Isolated-collective measurement worker (run as a module, one process
per fake host) for the all-reduce cost-model validation.

Each of ``nproc`` processes owns exactly ONE CPU device, so a ``psum``
over the 2-device mesh crosses the process boundary through the same
Gloo channel the multi-host tests ride (tests/multihost_worker.py).
Process 0 prints one JSON line: min-of-k wall-clock per payload size.

Usage:  python -m arcle_tpu.parallel.psum_worker <pid> <nproc> <port> \
            <comma-separated payload sizes in MB>
"""

import json
import os
import sys
import time

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
size_tokens = sys.argv[4].split(",")     # echoed back verbatim as keys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import Mesh, PartitionSpec as P  # noqa: E402
from jax.experimental.shard_map import shard_map  # noqa: E402

jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)
assert jax.device_count() == nproc, jax.device_count()
mesh = Mesh(np.array(jax.devices()), ("hosts",))

results = {}
for tok in size_tokens:
    mb = float(tok)
    n = int(mb * 1e6 / 4)
    # per-device local shard [1, n] -> global [nproc, n]; psum moves the
    # full n floats across the host boundary (ring: 2*(N-1)/N * bytes)
    local = jnp.ones((1, n), jnp.float32) * (pid + 1)

    @jax.jit
    def reduced(x):
        return shard_map(lambda s: jax.lax.psum(s, "hosts"), mesh=mesh,
                         in_specs=P("hosts", None),
                         out_specs=P("hosts", None))(x)

    garr = jax.make_array_from_single_device_arrays(
        (nproc, n), jax.sharding.NamedSharding(mesh, P("hosts", None)),
        [jax.device_put(local, jax.local_devices()[0])])
    out = jax.block_until_ready(reduced(garr))     # compile + warm
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        out = jax.block_until_ready(reduced(garr))
        best = min(best, time.perf_counter() - t0)
    # correctness of the collective itself: every element = sum of ranks
    expect = nproc * (nproc + 1) // 2
    np.testing.assert_allclose(
        np.asarray(out.addressable_shards[0].data)[0, :4], expect)
    results[tok] = best

if pid == 0:
    print("PSUM_TIMES " + json.dumps(results), flush=True)
