"""Native C++ single-env engine vs the NumPy oracle.

The oracle is the validated executable spec (itself fuzzed against the
executed reference in tests/test_oracle_vs_reference.py); the C++ engine
must match it bit-for-bit across every op family, including the
preserved reference quirks (off-grid objects, rotation parity, int8
trial counters, reset_on_submit replacement).
"""

import numpy as np
import pytest

from arcle_tpu import native
from arcle_tpu.ops.table import (
    raw_table, arc_table, o2arc_table)
from arcle_tpu.oracle import OracleEnv

pytestmark = pytest.mark.skipif(not native.engine_available(),
                                reason="no C++ toolchain")

FAMILIES = [
    ("raw", raw_table(-1), -1),
    ("arc", arc_table(-1), -1),
    ("o2arc", o2arc_table(-1), -1),
    ("o2arc", o2arc_table(3), 3),
    ("o2arc_crop33", o2arc_table(127, crop_at_33=True), 127),
    ("o2arc_nofill", o2arc_table(-1, no_fill=True), -1),
]


def _random_action(rng, n_ops, H=30, W=30):
    kind = rng.integers(0, 4)
    sel = np.zeros((H, W), np.int8)
    if kind == 0:          # empty (object continuation / NOOPs)
        pass
    elif kind == 1:        # single pixel
        sel[rng.integers(0, H), rng.integers(0, W)] = 1
    else:                  # bbox
        x1, x2 = sorted(rng.integers(0, H, 2).tolist())
        y1, y2 = sorted(rng.integers(0, W, 2).tolist())
        sel[x1:x2 + 1, y1:y2 + 1] = 1
    return sel, int(rng.integers(0, n_ops))


def _assert_state_equal(native_sd, oracle_st, t, fam):
    for k in ("trials_remain", "terminated", "input", "input_dim",
              "grid", "grid_dim", "selected", "clip", "clip_dim"):
        np.testing.assert_array_equal(
            native_sd[k], oracle_st[k], err_msg=f"{fam} step {t}: {k}")
    for k, v in native_sd["object_states"].items():
        np.testing.assert_array_equal(
            v, oracle_st["object_states"][k],
            err_msg=f"{fam} step {t}: object_states.{k}")


@pytest.mark.parametrize("fam,table,max_trial", FAMILIES,
                         ids=[f"{f[0]}-mt{f[2]}" for f in FAMILIES])
def test_engine_fuzz_vs_oracle(fam, table, max_trial):
    rng = np.random.default_rng(hash((fam, max_trial)) % (1 << 31))
    for trial in range(3):
        inp = rng.integers(0, 10, (int(rng.integers(2, 13)),
                                   int(rng.integers(2, 13)))).astype(np.int8)
        out = rng.integers(0, 10, (int(rng.integers(2, 13)),
                                   int(rng.integers(2, 13)))).astype(np.int8)
        ros = bool(trial == 2)
        eng = native.NativeEngine(table, max_trial=max_trial)
        eng.reset(inp, out, reset_on_submit=ros)
        orc = OracleEnv(fam, max_trial=max_trial)
        orc.reset(inp, out, reset_on_submit=ros)
        for t in range(120):
            sel, op = _random_action(rng, table.n_ops)
            r_n, term_n = eng.step(sel, op)
            _, r_o, term_o = orc.step(sel, op)
            assert r_n == r_o, (fam, t, r_n, r_o)
            assert term_n == term_o, (fam, t)
            _assert_state_equal(eng.state_dict(), orc.state, t, fam)


def test_engine_scripted_solve():
    """Color the grid into the answer then Submit => reward 1.0."""
    table = o2arc_table(-1)
    inp = np.zeros((3, 3), np.int8)
    ans = np.full((3, 3), 4, np.int8)
    eng = native.NativeEngine(table, max_trial=-1)
    eng.reset(inp, ans)
    sel = np.zeros((30, 30), np.int8)
    sel[:3, :3] = 1
    r, term = eng.step(sel, 4)          # Color4 over the whole grid
    assert r == 0.0 and not term
    r, term = eng.step(np.zeros((30, 30), np.int8), table.n_ops - 1)
    assert r == 1.0 and term


def test_engine_run_batched_ffi():
    """engine_run agrees with step-by-step over the same sequence."""
    table = o2arc_table(-1)
    rng = np.random.default_rng(3)
    inp = rng.integers(0, 10, (8, 8)).astype(np.int8)
    out = rng.integers(0, 10, (8, 8)).astype(np.int8)
    n = 200
    sels = np.zeros((n, 30, 30), np.int8)
    ops = np.zeros(n, np.int64)
    for i in range(n):
        sels[i], ops[i] = _random_action(rng, table.n_ops)
    a = native.NativeEngine(table, max_trial=-1)
    a.reset(inp, out)
    rew_a, term_a = a.run(sels, ops)
    b = native.NativeEngine(table, max_trial=-1)
    b.reset(inp, out)
    rew_b = np.zeros(n, np.float32)
    term_b = np.zeros(n, bool)
    for i in range(n):
        rew_b[i], term_b[i] = b.step(sels[i], ops[i])
    np.testing.assert_array_equal(rew_a, rew_b)
    np.testing.assert_array_equal(term_a, term_b)
    _ = a.state_dict(), b.state_dict()
    for k in ("grid", "selected", "clip"):
        np.testing.assert_array_equal(a.state_dict()[k], b.state_dict()[k])


def test_engine_small_frame():
    """5x5 frame (the Mini-ARC interactive setting)."""
    table = raw_table(-1)
    inp = np.arange(25, dtype=np.int8).reshape(5, 5) % 10
    ans = (np.arange(25, dtype=np.int8).reshape(5, 5) + 1) % 10
    eng = native.NativeEngine(table, H=5, W=5, max_trial=-1)
    eng.reset(inp, ans)
    sel = np.ones((5, 5), np.int8)
    r, term = eng.step(sel, 7)
    sd = eng.state_dict()
    assert sd["grid"].shape == (5, 5)
    assert (sd["grid"] == 7).all()
