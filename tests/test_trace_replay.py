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
    convert_ui_action, replay_trace, generate_golden_traces, ReplayReport,
)


@pytest.fixture(scope="module")
def golden():
    return generate_golden_traces(n_traces=24, seed=3, n_steps=25)


def test_convert_matches_reference_convention():
    op, sel = convert_ui_action((0, "RotateCW", [(1, 2), (4, 6)], None))
    assert op == 25 and sel[1:5, 2:7].all() and sel.sum() == 4 * 5
    op, sel = convert_ui_action((0, "FloodFill", [(3, 4), 7], None))
    assert op == 17 and sel[3, 4] and sel.sum() == 1
    with pytest.raises(Exception):
        convert_ui_action((0, "Teleport", [], None))


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
