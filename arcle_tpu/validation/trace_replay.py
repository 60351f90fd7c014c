"""Golden-trace replay harness.

The inherited validation asset from the reference (SURVEY.md §4): replay
recorded O2ARC-interface action logs through the environment and assert
the working grid matches the recorded grid after every action
(/root/reference/tests/o2arc_check.py).  The original human-trace pickles
are absent from the mount (.MISSING_LARGE_BLOBS), so this module provides

* :func:`convert_ui_action` — the exact UI-log -> (op, selection) mapping
  of the reference harness (o2arc_check.py:21-99), including the
  RotateCW→25 / RotateCCW→24 / FlipX→27 / FlipY→26 and Fill=rect-Color
  conventions;
* :func:`replay_trace` — the per-step comparison loop with the
  selection-continuation rule (ops 20..27 with an unchanged selection are
  sent with an *empty* selection, o2arc_check.py:169-170) and the
  tested/failure/error/omitted accounting;
* :func:`generate_golden_traces` — golden traces produced by the
  validated NumPy oracle (BASELINE.json sanctions reference-generated
  golden data; the oracle is fuzz-proven identical to the reference), in
  the same trace-entry format, so the harness runs hermetically.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# trace entry format (o2arc_check.py): (timestamp, action_name, data, grid)
TraceEntry = Tuple[object, str, list, np.ndarray]


def convert_ui_action(entry: TraceEntry) -> Tuple[int, np.ndarray]:
    """O2ARC UI log entry -> (operation index, selection mask).

    Raises on unknown action names; callers treat that as "omitted"
    exactly like the reference harness.
    """
    _, action, data, _grid = entry
    sel = np.zeros((30, 30), dtype=np.bool_)
    if action == "CopyFromInput":
        return 31, sel
    if action == "ResizeGrid":
        h, w = data[0]
        sel[:h, :w] = 1
        return 33, sel
    if action == "ResetGrid":
        return 32, sel
    if action == "Submit":
        return 34, sel
    if action == "Color":
        (h, w), op = data[0], data[1]
        sel[h, w] = 1
        return op, sel
    if action == "Fill":
        (h0, w0), (h1, w1), op = data[0], data[1], data[2]
        sel[h0:h1 + 1, w0:w1 + 1] = 1
        return op, sel
    rect_ops = {"FlipX": 27, "FlipY": 26, "RotateCW": 25, "RotateCCW": 24}
    if action in rect_ops:
        (h0, w0), (h1, w1) = data[0], data[1]
        sel[h0:h1 + 1, w0:w1 + 1] = 1
        return rect_ops[action], sel
    if action == "Move":
        (h0, w0), (h1, w1), d = data[0], data[1], data[2]
        sel[h0:h1 + 1, w0:w1 + 1] = 1
        return {"U": 20, "D": 21, "R": 22, "L": 23}[d], sel
    if action == "Copy":
        (h0, w0), (h1, w1), src = data[0], data[1], data[2]
        sel[h0:h1 + 1, w0:w1 + 1] = 1
        return {"Input Grid": 28, "Output Grid": 29}[src], sel
    if action == "Paste":
        h, w = data[0]
        sel[h, w] = 1
        return 30, sel
    if action == "FloodFill":
        (h, w), c = data[0], data[1]
        sel[h, w] = 1
        return 10 + c, sel
    raise ValueError(f"unconvertible action {action!r}")


@dataclasses.dataclass
class ReplayReport:
    tested: int = 0
    failures: List[int] = dataclasses.field(default_factory=list)
    errors: List[int] = dataclasses.field(default_factory=list)
    omitted: List[int] = dataclasses.field(default_factory=list)

    @property
    def pass_rate(self) -> float:
        if self.tested == 0:
            return 0.0
        return (self.tested - len(self.failures) - len(self.errors)) \
            / self.tested * 100.0

    def summary(self) -> str:
        return (f"Tested: {self.tested}, Passed: {self.pass_rate:.2f}% "
                f"(errors {len(self.errors)}, failures {len(self.failures)},"
                f" omitted {len(self.omitted)})")


def replay_trace(env, trace: Sequence[TraceEntry], reset_options: Dict,
                 idx: int, report: ReplayReport) -> bool:
    """Replay one converted trace through a Gymnasium env; compares
    (grid_dim, grid[:h,:w]) to the recorded grid per step
    (o2arc_check.py:184-195)."""
    try:
        converted = [convert_ui_action(e) for e in trace]
    except Exception:
        report.omitted.append(idx)
        return False

    obs, _info = env.reset(options=reset_options)
    report.tested += 1
    for i, (op, sel) in enumerate(converted):
        # selection-continuation rule (o2arc_check.py:169-170)
        if 20 <= op <= 27 and np.array_equal(
                np.asarray(obs["selected"], bool), sel):
            sel = np.zeros((30, 30), dtype=np.bool_)
        try:
            obs, reward, term, trunc, _info = env.step(
                {"selection": sel.astype(np.int8), "operation": op})
        except Exception:
            report.errors.append(idx)
            return False
        h, w = (int(v) for v in obs["grid_dim"])
        want = np.asarray(trace[i][3], np.int8)
        if want.shape != (h, w) or (obs["grid"][:h, :w] != want).any():
            report.failures.append(idx)
            return False
        if term or trunc:
            break
    return True


def replay_trace_firstsel(env, trace: Sequence[TraceEntry],
                          reset_options: Dict, idx: int,
                          report: ReplayReport) -> bool:
    """First-selection variant (o2arc_check_firstsel.py): every object op
    after the first keeps an empty selection (pure continuation), and only
    ``grid_dim`` is compared per step (its :176-181)."""
    try:
        converted = [convert_ui_action(e) for e in trace]
    except Exception:
        report.omitted.append(idx)
        return False

    obs, _info = env.reset(options=reset_options)
    report.tested += 1
    prev_obj_op = False
    for i, (op, sel) in enumerate(converted):
        if 20 <= op <= 27:
            if prev_obj_op:
                sel = np.zeros((30, 30), dtype=np.bool_)
            prev_obj_op = True
        else:
            prev_obj_op = False
        try:
            obs, reward, term, trunc, _info = env.step(
                {"selection": sel.astype(np.int8), "operation": op})
        except Exception:
            report.errors.append(idx)
            return False
        want = np.asarray(trace[i][3], np.int8)
        if tuple(int(v) for v in obs["grid_dim"]) != want.shape:
            report.failures.append(idx)
            return False
        if term or trunc:
            break
    return True


def generate_golden_traces(n_traces: int = 50, seed: int = 0,
                           n_steps: int = 30,
                           tasks: Optional[list] = None):
    """Produce golden traces in the o2arc_check entry format by driving the
    validated NumPy oracle with random UI-style actions.

    Returns (tasks, traces, infos): infos are (task_index, subprob_index)
    pairs the replay pins (the trace-info convention of the reference
    pickles)."""
    from ..oracle import OracleEnv
    from ..loaders.synthetic import make_tasks

    rng = np.random.default_rng(seed)
    if tasks is None:
        tasks = make_tasks(max(8, n_traces // 4), seed=seed + 1)

    def random_ui_action():
        r = int(rng.integers(0, 12))
        p = lambda: (int(rng.integers(0, 30)), int(rng.integers(0, 30)))

        def rect():
            (x1, y1), (x2, y2) = p(), p()
            # normalize per axis (UI semantics; tuple-sort would leave
            # inverted columns producing empty selections)
            return ((min(x1, x2), min(y1, y2)), (max(x1, x2), max(y1, y2)))
        if r == 0:
            return ("Color", [p(), int(rng.integers(0, 10))])
        if r == 1:
            a, b = rect()
            return ("Fill", [a, b, int(rng.integers(0, 10))])
        if r == 2:
            return ("FloodFill", [p(), int(rng.integers(0, 10))])
        if r == 3:
            a, b = rect()
            return ("Move", [a, b, "UDRL"[int(rng.integers(0, 4))]])
        if r == 4:
            a, b = rect()
            return (["RotateCW", "RotateCCW"][int(rng.integers(0, 2))],
                    [a, b])
        if r == 5:
            a, b = rect()
            return (["FlipX", "FlipY"][int(rng.integers(0, 2))], [a, b])
        if r == 6:
            a, b = rect()
            return ("Copy", [a, b, ["Input Grid", "Output Grid"]
                             [int(rng.integers(0, 2))]])
        if r == 7:
            return ("Paste", [p()])
        if r == 8:
            return ("CopyFromInput", [])
        if r == 9:
            return ("ResizeGrid", [(int(rng.integers(1, 31)),
                                    int(rng.integers(1, 31)))])
        if r == 10:
            return ("ResetGrid", [])
        return ("Color", [p(), int(rng.integers(0, 10))])

    traces, infos = [], []
    for t in range(n_traces):
        ti = int(rng.integers(0, len(tasks)))
        test_in, test_out = tasks[ti][2][0], tasks[ti][3][0]
        orc = OracleEnv("o2arc", max_trial=-1)
        orc.reset(test_in, test_out)
        trace = []
        for _s in range(n_steps):
            name, data = random_ui_action()
            op, sel = convert_ui_action((None, name, data, None))
            # the continuation rule applies at record time too: replays
            # send empty selections when the selection is unchanged, and
            # both sides must take the same branch
            st = orc.state
            if 20 <= op <= 27 and np.array_equal(
                    st["selected"].astype(bool), sel):
                sel = np.zeros((30, 30), dtype=np.bool_)
            st, _r, term = orc.step(sel.astype(np.int8), op)
            h, w = (int(v) for v in st["grid_dim"])
            trace.append((_s, name, data, st["grid"][:h, :w].copy()))
            if term:
                break
        traces.append(trace)
        infos.append((ti, 0))
    return tasks, traces, infos
