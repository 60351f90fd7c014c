"""Golden-trace replay: oracle-recorded UI traces through the JAX gym env,
and (when the reference is importable) through the reference env too —
the o2arc_check mechanism with regenerated golden data (SURVEY.md §4)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

from arcle_tpu.envs import O2ARCv2Env
from arcle_tpu.loaders import ListLoader
from arcle_tpu.validation import (
    convert_ui_action, replay_trace, generate_golden_traces,
    generate_adversarial_traces, ReplayReport,
)


@pytest.fixture(scope="module")
def golden():
    """>=200 traces: random walks + scripted adversarial traces (long
    continuation chains, off-grid excursions, serpentine floods,
    paste-over-edge, rotation parity round trips)."""
    tasks, traces, infos = generate_golden_traces(
        n_traces=130, seed=3, n_steps=25)
    n_tasks = len(tasks)
    atasks, atraces, ainfos = generate_adversarial_traces(seed=9)
    tasks = list(tasks) + list(atasks)
    traces = traces + atraces
    infos = infos + [(ti + n_tasks, sub) for ti, sub in ainfos]
    assert len(traces) >= 200
    return tasks, traces, infos


def test_convert_matches_reference_convention():
    op, sel = convert_ui_action((0, "RotateCW", [(1, 2), (4, 6)], None))
    assert op == 25 and sel[1:5, 2:7].all() and sel.sum() == 4 * 5
    op, sel = convert_ui_action((0, "FloodFill", [(3, 4), 7], None))
    assert op == 17 and sel[3, 4] and sel.sum() == 1
    with pytest.raises(Exception):
        convert_ui_action((0, "Teleport", [], None))


@pytest.mark.slow
def test_replay_golden_through_jax_env(golden):
    tasks, traces, infos = golden
    env = O2ARCv2Env(data_loader=ListLoader(tasks), max_trial=-1)
    report = ReplayReport()
    for idx, (trace, (ti, sub)) in enumerate(zip(traces, infos)):
        replay_trace(env, trace,
                     {"adaptation": False, "prob_index": ti,
                      "subprob_index": sub}, idx, report)
    assert report.tested == len(traces)
    assert report.pass_rate == 100.0, report.summary()


def test_replay_golden_through_reference_env(golden):
    """The same golden traces must replay through the *reference* env —
    proving the golden data is faithful to the original semantics."""
    try:
        from arcle.envs.o2arcenv import O2ARCv2Env as RefEnv
        from arcle.loaders import Loader
    except Exception:
        pytest.skip("reference not importable")

    tasks, traces, infos = golden

    class Tasks(Loader):
        def get_path(self, **kw):
            return ["<mem>"] * len(tasks)

        def parse(self, **kw):
            return tasks

    env = RefEnv(data_loader=Tasks(), max_trial=-1)
    report = ReplayReport()
    for idx, (trace, (ti, sub)) in enumerate(zip(traces, infos)):
        replay_trace(env, trace,
                     {"adaptation": False, "prob_index": ti,
                      "subprob_index": sub}, idx, report)
    assert report.pass_rate == 100.0, report.summary()


def test_replay_firstsel_variant():
    """First-selection harness (o2arc_check_firstsel mechanism): object-op
    sequences recorded with continuation semantics replay with only
    grid_dim compared."""
    import numpy as np
    from arcle_tpu.oracle import OracleEnv
    from arcle_tpu.loaders.synthetic import make_tasks
    from arcle_tpu.validation import convert_ui_action
    from arcle_tpu.validation.trace_replay import replay_trace_firstsel

    rng = np.random.default_rng(5)
    tasks = make_tasks(4, seed=6)
    traces, infos = [], []
    for t in range(8):
        ti = int(rng.integers(0, len(tasks)))
        test_in, test_out = tasks[ti][2][0], tasks[ti][3][0]
        orc = OracleEnv("o2arc", max_trial=-1)
        orc.reset(test_in, test_out)
        trace = []
        # one bbox-selected object op, then continuation ops with the UI
        # still logging rectangles (firstsel replay blanks them)
        a = (int(rng.integers(0, 8)), int(rng.integers(0, 8)))
        b = (a[0] + int(rng.integers(1, 4)), a[1] + int(rng.integers(1, 4)))
        seq = [("Move", [a, b, "R"], False)]
        for _ in range(4):
            name = ["Move", "RotateCW", "FlipX"][int(rng.integers(0, 3))]
            data = [a, b, "D"] if name == "Move" else [a, b]
            seq.append((name, data, True))
        for name, data, cont in seq:
            op, sel = convert_ui_action((None, name, data, None))
            orc_sel = np.zeros((30, 30), np.int8) if cont \
                else sel.astype(np.int8)
            st, _r, term = orc.step(orc_sel, op)
            h, w = (int(v) for v in st["grid_dim"])
            trace.append((0, name, data, st["grid"][:h, :w].copy()))
            if term:
                break
        traces.append(trace)
        infos.append((ti, 0))

    env = O2ARCv2Env(data_loader=ListLoader(tasks), max_trial=-1)
    from arcle_tpu.validation import ReplayReport
    report = ReplayReport()
    for idx, (trace, (ti, sub)) in enumerate(zip(traces, infos)):
        replay_trace_firstsel(env, trace,
                              {"adaptation": False, "prob_index": ti,
                               "subprob_index": sub}, idx, report)
    assert report.pass_rate == 100.0, report.summary()
