"""Roofline accounting + measured engine auto-pick."""

import jax
import jax.numpy as jnp
import numpy as np

from arcle_tpu.benchmarks import roofline
from arcle_tpu.envs import BatchedEnv
from arcle_tpu.loaders import SyntheticLoader
from arcle_tpu.ops import o2arc_table, raw_table


def test_device_peaks_known_kinds():
    p = roofline.device_peaks()
    assert p["hbm_gbps"] > 0 and p["bf16_tflops"] > 0
    assert "kind" in p


def test_cost_from_compiled_counts_flops_and_bytes():
    def f(x):
        return (x @ x).sum()

    x = jnp.ones((128, 128), jnp.float32)
    compiled = jax.jit(f).lower(x).compile()
    cost = roofline.cost_from_compiled(compiled)
    assert cost is not None
    # one 128^3 matmul = 2*128^3 flops (XLA counts multiply-adds as 2)
    assert cost["flops"] >= 2 * 128 ** 3 * 0.9
    assert cost["bytes"] >= 128 * 128 * 4


def test_pallas_step_bytes_model():
    b_obj = roofline.pallas_step_bytes(o2arc_table(), 4096)
    b_raw = roofline.pallas_step_bytes(raw_table(), 4096)
    # object tables stream the two 900x900 bf16 permutation matrices
    # (per 64-env block, normalized per env-step)
    assert b_obj - b_raw == 2 * 900 * 900 * 2 * (4096 // 64) / 4096
    # state traffic: ~15 grid-sized operands/results per env-step
    assert 13 * 900 < b_raw < 18 * 900


def test_summarize_normalizes_per_step():
    cost = {"flops": 1e9, "bytes": 2e9}
    out = roofline.summarize(1e6, batch=1000, steps=100, cost=cost)
    # 2e9 bytes / 1e5 env-steps = 2e4 B/step; at 1e6 steps/s = 20 GB/s
    assert out["xla_bytes_per_env_step"] == 2e4
    peaks = roofline.device_peaks()
    np.testing.assert_allclose(
        out["hbm_util_pct"], 100 * 2e10 / (peaks["hbm_gbps"] * 1e9),
        rtol=1e-3)


def test_pick_engine_cpu_is_xla():
    """On CPU (and any non-64-divisible batch) the pick is always the
    XLA path, computed without timing probes."""
    def builder(use_pallas):
        return BatchedEnv(table=o2arc_table(), use_pallas=use_pallas,
                          bank=SyntheticLoader(4, seed=1).bank())

    assert roofline.pick_engine(builder, 128) is False
    assert roofline.pick_engine(builder, 100) is False
