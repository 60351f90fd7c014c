"""Gym adapter parity: the arcle_tpu Gymnasium classes against the actual
reference envs, step by step, plus registration/space/wrapper checks."""

import sys

import numpy as np
import pytest
import gymnasium as gym

sys.path.insert(0, "/root/reference")

from arcle_tpu.loaders import ListLoader, SyntheticLoader, make_tasks
from arcle_tpu.envs import RawARCEnv, O2ARCv2Env, O2ARCNoFillEnv
from arcle_tpu.wrappers import BBoxWrapper, PointWrapper, FilterO2ARC

from test_oracle_vs_reference import (
    random_grid, random_selection, _single_task_loader, REF_AVAILABLE,
    compare_states,
)


@pytest.mark.skipif(not REF_AVAILABLE, reason="reference not importable")
@pytest.mark.parametrize("seed", range(3))
def test_o2arc_gym_adapter_vs_reference(seed):
    from arcle.envs.o2arcenv import O2ARCv2Env as RefO2

    rng = np.random.default_rng(seed + 40)
    inp = random_grid(rng, 6, 7)
    out = random_grid(rng, 5, 5)

    ref = RefO2(data_loader=_single_task_loader(inp, out), max_trial=3)
    ref_obs, ref_info = ref.reset(options={"prob_index": 0,
                                           "subprob_index": 0,
                                           "adaptation": True})

    ours = O2ARCv2Env(data_loader=ListLoader([([inp], [out], [inp], [out],
                                               {"id": "t"})]), max_trial=3)
    our_obs, our_info = ours.reset(options={"prob_index": 0,
                                            "subprob_index": 0,
                                            "adaptation": True})
    compare_states(ref_obs, _nest(our_obs), -1, -1)
    np.testing.assert_array_equal(ref_info["answer"], our_info["answer"])

    for t in range(120):
        op = int(rng.integers(0, 35))
        sel = random_selection(rng)
        action = {"selection": sel, "operation": op}
        ref_obs, rr, rt, _, ref_inf = ref.step(action)
        our_obs, orr, ot, _, our_inf = ours.step(action)
        compare_states(ref_obs, _nest(our_obs), t, op)
        assert rr == orr and rt == ot
        assert ref_inf["steps"] == our_inf["steps"]
        assert ref_inf["submit_count"] == our_inf["submit_count"]
        if rt:
            break


def _nest(obs):
    """Adapter obs -> oracle-style nested dict for compare_states."""
    return obs


def test_gym_make_registered_ids():
    # ARCLE-TPU/* always resolves to this package even when the reference
    # arcle (imported by the parity tests above) re-registers ARCLE/*.
    loader = SyntheticLoader(4, seed=1)
    for env_id in ["ARCLE-TPU/RawARCEnv-v0", "ARCLE-TPU/ARCEnv-v0",
                   "ARCLE-TPU/O2ARCv2Env-v0", "ARCLE-TPU/O2ARCEnv-v2",
                   "ARCLE-TPU/O2ARCNoFillEnv"]:
        env = gym.make(env_id, data_loader=loader)
        obs, info = env.reset(options={"prob_index": 0, "subprob_index": 0})
        assert env.observation_space.contains(obs), env_id
        assert "answer" in info
        env.close()


def test_obs_space_contains_after_steps():
    env = O2ARCv2Env(data_loader=SyntheticLoader(4, seed=2), max_trial=3)
    obs, _ = env.reset(seed=0, options={"prob_index": 0})
    rng = np.random.default_rng(0)
    for _ in range(30):
        action = {"selection": random_selection(rng),
                  "operation": int(rng.integers(0, 35))}
        obs, r, term, trunc, info = env.step(action)
        if term:
            break
    # int8 dtype + shapes stay inside the declared space
    assert env.observation_space["grid"].contains(obs["grid"])
    assert obs["grid"].dtype == np.int8


def test_wrappers_roundtrip():
    env = O2ARCv2Env(data_loader=SyntheticLoader(4, seed=3), max_trial=3)
    wrapped = BBoxWrapper(env)
    obs, _ = wrapped.reset(seed=1, options={"prob_index": 0})
    obs, r, term, trunc, info = wrapped.step((2, 3, 0, 1, 4))
    g = obs["grid"]
    assert (g[0:3, 1:4] == 4).all()   # bbox normalized corners, colored 4

    env2 = O2ARCv2Env(data_loader=SyntheticLoader(4, seed=3), max_trial=3)
    p = PointWrapper(env2)
    obs, _ = p.reset(seed=1, options={"prob_index": 0})
    obs, *_ = p.step((2, 2, 7))
    assert obs["grid"][2, 2] == 7

    f = FilterO2ARC(env)
    fobs = f.observation(obs)
    assert set(fobs.keys()) == {"trials_remain", "grid", "grid_dim", "clip",
                                "clip_dim", "active", "object", "object_dim",
                                "object_pos"}


def test_nofill_env_table():
    env = O2ARCNoFillEnv(data_loader=SyntheticLoader(2, seed=4))
    assert len(env.operations) == 25
    assert env.op_names[10] == "MoveU"   # flood ops dropped


def test_ansi_render_smoke(capsys):
    env = O2ARCv2Env(data_loader=SyntheticLoader(2, seed=5),
                     render_mode="ansi")
    env.reset(seed=0, options={"prob_index": 0})
    sel = np.zeros((30, 30), np.int8)
    sel[0, 0] = 1
    env.step({"selection": sel, "operation": 3})
    out = capsys.readouterr().out
    assert "Problem Description" in out and "\033[48;5;" in out


def test_backend_parity_native_vs_jax():
    """The adapter's two backends (native C++ engine vs jitted device
    step) must produce identical observations/rewards step for step."""
    from arcle_tpu.native import engine_available
    import pytest as _pytest
    if not engine_available():
        _pytest.skip("no C++ toolchain")
    rng = np.random.default_rng(42)
    envs = [O2ARCv2Env(data_loader=SyntheticLoader(3, seed=9), backend=b)
            for b in ("native", "jax")]
    assert envs[0]._native is not None and envs[1]._native is None
    obs = [e.reset(seed=0, options={"prob_index": 1, "subprob_index": 0})[0]
           for e in envs]
    for t in range(60):
        sel = np.zeros((30, 30), np.int8)
        if t % 3 != 0:
            x1, x2 = sorted(rng.integers(0, 30, 2).tolist())
            y1, y2 = sorted(rng.integers(0, 30, 2).tolist())
            sel[x1:x2 + 1, y1:y2 + 1] = 1
        op = int(rng.integers(0, 35))
        act = {"selection": sel, "operation": op}
        outs = [e.step(act) for e in envs]
        (o_n, r_n, t_n, _, i_n), (o_j, r_j, t_j, _, i_j) = outs
        assert r_n == r_j and t_n == t_j, (t, op)
        for k in ("grid", "grid_dim", "selected", "clip", "clip_dim",
                  "trials_remain", "terminated"):
            np.testing.assert_array_equal(o_n[k], o_j[k],
                                          err_msg=f"step {t} op {op}: {k}")
        for k in ("object", "object_sel", "object_pos", "object_dim",
                  "active", "background", "rotation_parity"):
            np.testing.assert_array_equal(
                o_n["object_states"][k], o_j["object_states"][k],
                err_msg=f"step {t} op {op}: object_states.{k}")
