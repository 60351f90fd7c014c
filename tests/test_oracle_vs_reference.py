"""Validate the NumPy oracle against the *actual* reference implementation
executed from /root/reference (ground truth for all parity work).

The reference envs are driven through their real Gymnasium classes with an
injected single-task loader (the TestLoader seam from the reference's own
tests/o2arcex.py:10-21), and every state field is compared after every
random action.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

from arcle_tpu.oracle import OracleEnv

REF_AVAILABLE = True
try:
    from arcle.envs.o2arcenv import O2ARCv2Env
    from arcle.envs.arcenv import RawARCEnv
    from arcle.loaders import Loader
except Exception:  # pragma: no cover
    REF_AVAILABLE = False

pytestmark = pytest.mark.skipif(not REF_AVAILABLE,
                                reason="reference not importable")


def _single_task_loader(inp, out):
    class OneTask(Loader):
        def get_path(self, **kw):
            return ["<mem>"]

        def parse(self, **kw):
            return [([inp], [out], [inp], [out], {"id": "mem"})]

    return OneTask()


def random_grid(rng, h, w, colors=10):
    return rng.integers(0, colors, size=(h, w)).astype(np.int8)


def random_selection(rng, H=30, W=30, style=None):
    """Mix of empty / point / bbox / sparse masks."""
    style = style if style is not None else rng.integers(0, 4)
    sel = np.zeros((H, W), np.int8)
    if style == 0:
        return sel  # empty
    if style == 1:
        sel[rng.integers(0, H), rng.integers(0, W)] = 1
        return sel
    if style == 2:
        x1, x2 = sorted(rng.integers(0, H, 2).tolist())
        y1, y2 = sorted(rng.integers(0, W, 2).tolist())
        sel[x1:x2 + 1, y1:y2 + 1] = 1
        return sel
    sel[rng.random((H, W)) < 0.08] = 1
    return sel


def compare_states(ref_state, oracle_state, step_no, op):
    for key in ("trials_remain", "terminated", "input", "input_dim",
                "grid", "grid_dim"):
        np.testing.assert_array_equal(
            ref_state[key], oracle_state[key],
            err_msg=f"step {step_no} op {op} field {key}")
    if "selected" in ref_state:
        for key in ("selected", "clip", "clip_dim"):
            np.testing.assert_array_equal(
                ref_state[key], oracle_state[key],
                err_msg=f"step {step_no} op {op} field {key}")
        for key in ("active", "object", "object_sel", "object_dim",
                    "object_pos", "background", "rotation_parity"):
            np.testing.assert_array_equal(
                ref_state["object_states"][key],
                oracle_state["object_states"][key],
                err_msg=f"step {step_no} op {op} object_states.{key}")


@pytest.mark.parametrize("seed", range(8))
def test_o2arc_fuzz(seed):
    rng = np.random.default_rng(seed)
    inp = random_grid(rng, int(rng.integers(2, 16)), int(rng.integers(2, 16)))
    out = random_grid(rng, int(rng.integers(2, 16)), int(rng.integers(2, 16)))

    ref = O2ARCv2Env(data_loader=_single_task_loader(inp, out), max_trial=3)
    ref_obs, _ = ref.reset(options={"prob_index": 0, "subprob_index": 0,
                                    "adaptation": True})
    orc = OracleEnv("o2arc", max_trial=3)
    orc.reset(inp, out)
    compare_states(ref_obs, orc.state, -1, -1)

    for t in range(300):
        op = int(rng.integers(0, 35))
        sel = random_selection(rng)
        ref_obs, ref_r, ref_term, _, _ = ref.step(
            {"selection": sel, "operation": op})
        orc_state, orc_r, orc_term = orc.step(sel, op)
        compare_states(ref_obs, orc_state, t, op)
        assert ref_r == orc_r, f"step {t} op {op}: reward {ref_r} != {orc_r}"
        assert ref_term == orc_term, f"step {t} op {op}: terminated mismatch"
        if ref_term:
            break


@pytest.mark.parametrize("seed", range(4))
def test_raw_fuzz(seed):
    rng = np.random.default_rng(seed + 100)
    inp = random_grid(rng, int(rng.integers(2, 10)), int(rng.integers(2, 10)))
    out = random_grid(rng, int(rng.integers(2, 10)), int(rng.integers(2, 10)))

    ref = RawARCEnv(data_loader=_single_task_loader(inp, out), max_trial=3)
    ref_obs, _ = ref.reset(options={"prob_index": 0, "subprob_index": 0,
                                    "adaptation": True})
    orc = OracleEnv("raw", max_trial=3)
    orc.reset(inp, out)

    for t in range(100):
        op = int(rng.integers(0, 12))
        sel = random_selection(rng)
        ref_obs, ref_r, ref_term, _, _ = ref.step(
            {"selection": sel, "operation": op})
        orc_state, orc_r, orc_term = orc.step(sel, op)
        compare_states(ref_obs, orc_state, t, op)
        assert ref_r == orc_r
        assert ref_term == orc_term
        if ref_term:
            break


@pytest.mark.parametrize("seed", range(2))
def test_o2arc_reset_on_submit(seed):
    rng = np.random.default_rng(seed + 777)
    inp = random_grid(rng, 5, 5)
    out = random_grid(rng, 5, 5)

    ref = O2ARCv2Env(data_loader=_single_task_loader(inp, out), max_trial=5)
    ref_obs, _ = ref.reset(options={"prob_index": 0, "subprob_index": 0,
                                    "adaptation": True,
                                    "reset_on_submit": True})
    orc = OracleEnv("o2arc", max_trial=5)
    orc.reset(inp, out, reset_on_submit=True)

    for t in range(120):
        op = int(rng.integers(0, 35))
        if rng.random() < 0.2:
            op = 34  # exercise submit often
        sel = random_selection(rng)
        ref_obs, ref_r, ref_term, _, _ = ref.step(
            {"selection": sel, "operation": op})
        orc_state, orc_r, orc_term = orc.step(sel, op)
        compare_states(ref_obs, orc_state, t, op)
        assert ref_r == orc_r
        assert ref_term == orc_term
        if ref_term:
            break
