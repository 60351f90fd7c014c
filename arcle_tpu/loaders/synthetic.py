"""Synthetic ARC-like task generation.

The dataset submodules are not checked out in this environment
(``/root/reference/.gitmodules`` references them but the dirs are empty),
so the framework bundles a generator for structurally ARC-like tasks:
each task applies one hidden transformation (recolor / flip / rotate /
translate) consistently across its train and test pairs.  Used to build
the bundled sample dataset, loader tests, and benchmark task banks.
"""

from __future__ import annotations

import json
import os
from typing import List

import numpy as np

from .loader import Loader, TaskTuple


def _random_sprite(rng: np.random.Generator, h: int, w: int,
                   colors: int) -> np.ndarray:
    g = rng.integers(0, colors, size=(h, w)).astype(np.int8)
    # sparsify so flood fill / object ops have structure to bite on
    g[rng.random((h, w)) < 0.4] = 0
    return g


def _apply_rule(grid: np.ndarray, rule: int, perm: np.ndarray) -> np.ndarray:
    if rule == 0:                      # color permutation
        return perm[grid].astype(np.int8)
    if rule == 1:                      # horizontal flip
        return np.fliplr(grid).copy()
    if rule == 2:                      # vertical flip
        return np.flipud(grid).copy()
    if rule == 3:                      # rotate 90 CCW
        return np.rot90(grid).copy()
    if rule == 4:                      # rotate 180
        return np.rot90(grid, 2).copy()
    return grid.copy()                 # identity


def make_task(rng: np.random.Generator, min_size: int = 3,
              max_size: int = 12, n_train: int = 3, n_test: int = 1,
              colors: int = 10) -> TaskTuple:
    rule = int(rng.integers(0, 6))
    perm = np.concatenate([[0], rng.permutation(np.arange(1, colors))])
    ti, to, ei, eo = [], [], [], []
    for k in range(n_train + n_test):
        h = int(rng.integers(min_size, max_size + 1))
        w = int(rng.integers(min_size, max_size + 1))
        i = _random_sprite(rng, h, w, colors)
        o = _apply_rule(i, rule, perm)
        (ti if k < n_train else ei).append(i)
        (to if k < n_train else eo).append(o)
    return ti, to, ei, eo, {"id": f"synth{rng.integers(0, 1 << 30):08x}",
                            "rule": rule}


def make_tasks(n_tasks: int, seed: int = 0, **kw) -> List[TaskTuple]:
    rng = np.random.default_rng(seed)
    return [make_task(rng, **kw) for _ in range(n_tasks)]


class SyntheticLoader(Loader):
    """In-memory synthetic dataset — the batteries-included default."""

    def __init__(self, n_tasks: int = 32, seed: int = 0, **task_kw):
        self._n_tasks = n_tasks
        self._seed = seed
        self._task_kw = task_kw
        super().__init__()

    def get_path(self, **kwargs):
        return ["<synthetic>"] * self._n_tasks

    def parse(self, **kwargs):
        return make_tasks(self._n_tasks, self._seed, **self._task_kw)


def write_corpus(root: str, n_tasks: int = 400, n_train: int = 6,
                 n_test: int = 2, seed: int = 11,
                 max_size: int = 30) -> int:
    """Materialize a reference-scale ARC-layout corpus (the reference's
    operating envelope: 400 training tasks / ~3000 pairs,
    loader.py:72-87) under ``<root>/training``.  Returns the pair count."""
    rng = np.random.default_rng(seed)
    sub = os.path.join(root, "training")
    os.makedirs(sub, exist_ok=True)
    pairs = 0
    for k in range(n_tasks):
        task = make_task(rng, min_size=3, max_size=max_size,
                         n_train=n_train, n_test=n_test)
        ti, to, ei, eo, _ = task
        payload = {
            "train": [{"input": i.tolist(), "output": o.tolist()}
                      for i, o in zip(ti, to)],
            "test": [{"input": i.tolist(), "output": o.tolist()}
                     for i, o in zip(ei, eo)],
        }
        with open(os.path.join(sub, f"corpus{k:04d}.json"), "w") as fp:
            json.dump(payload, fp)
        pairs += len(ti) + len(ei)
    return pairs


def write_real_layout_fixture(root: str, n_train: int = 400,
                              n_eval: int = 400, n_mini: int = 149,
                              seed: int = 23) -> dict:
    """Materialize a fixture tree that mimics the *real* corpora layouts
    the loaders were written for (reference loader.py:72-87,116-157),
    since the actual submodules are absent from this mount:

    * ARC: ``<root>/ARC/data/{training|evaluation}/<8-hex-id>.json`` —
      400/400 tasks, 2-10 train + 1-3 test pairs, grids 1x1..30x30.
    * Mini-ARC: ``<root>/Mini-ARC/data/MiniARC/<description>_<id>.json``
      — 5x5 grids, messy human filenames (spaces, apostrophes, multiple
      underscores, description-free names) and literal ``null`` cells in
      a fraction of files (the quirk the loader's raw-text null->"0"
      replacement exists for).

    Returns {"arc_training": dir, "arc_evaluation": dir, "miniarc": dir,
    "n_null_files": int, "expected_mini_order": [ids...]}.
    """
    rng = np.random.default_rng(seed)

    def dump_json(task: TaskTuple, path: str, with_null: bool = False):
        ti, to, ei, eo, _ = task
        payload = {
            "train": [{"input": i.tolist(), "output": o.tolist()}
                      for i, o in zip(ti, to)],
            "test": [{"input": i.tolist(), "output": o.tolist()}
                     for i, o in zip(ei, eo)],
        }
        text = json.dumps(payload)
        if with_null:
            # the real Mini-ARC files carry literal nulls for empty cells
            text = text.replace("0", "null")
        with open(path, "w") as fp:
            fp.write(text)

    arc_root = os.path.join(root, "ARC", "data")
    for sub, n in (("training", n_train), ("evaluation", n_eval)):
        d = os.path.join(arc_root, sub)
        os.makedirs(d, exist_ok=True)
        for _ in range(n):
            tid = "".join(rng.choice(list("0123456789abcdef"), 8))
            task = make_task(rng, min_size=1, max_size=30,
                             n_train=int(rng.integers(2, 11)),
                             n_test=int(rng.integers(1, 4)))
            dump_json(task, os.path.join(d, f"{tid}.json"))

    mini_dir = os.path.join(root, "Mini-ARC", "data", "MiniARC")
    os.makedirs(mini_dir, exist_ok=True)
    descs = ["Make a pattern symmetric", "Deleting left object",
             "color the largest shape", "move object down",
             "fill holes", "rotate the grid's shape",
             "count_and_paint objects", ""]
    n_null_files = 0
    names = []
    for k in range(n_mini):
        tid = "".join(rng.choice(list(
            "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
        ), 20))
        desc = descs[k % len(descs)]
        fname = f"{desc}_{tid}.json" if desc else f"{tid}.json"
        task = make_task(rng, min_size=5, max_size=5,
                         n_train=int(rng.integers(2, 5)), n_test=1)
        with_null = (k % 3 == 0)
        n_null_files += int(with_null)
        dump_json(task, os.path.join(mini_dir, fname), with_null)
        names.append(fname)
    # the loader sorts by fn.split('_')[-1] over FULL paths
    expected = sorted((os.path.join(mini_dir, n) for n in names),
                      key=lambda fn: fn.split("_")[-1])
    return {"arc_training": os.path.join(arc_root, "training"),
            "arc_evaluation": os.path.join(arc_root, "evaluation"),
            "arc_root": arc_root, "miniarc_dir": mini_dir,
            "n_null_files": n_null_files,
            "expected_mini_order": expected}


def write_sample_dataset(root: str, n_train_tasks: int = 16,
                         n_eval_tasks: int = 8, n_mini: int = 8,
                         seed: int = 7) -> None:
    """Materialize a bundled ARC-layout sample dataset on disk."""
    rng = np.random.default_rng(seed)

    def dump(task: TaskTuple, path: str):
        ti, to, ei, eo, _ = task
        payload = {
            "train": [{"input": i.tolist(), "output": o.tolist()}
                      for i, o in zip(ti, to)],
            "test": [{"input": i.tolist(), "output": o.tolist()}
                     for i, o in zip(ei, eo)],
        }
        with open(path, "w") as fp:
            json.dump(payload, fp)

    arc = os.path.join(root, "sample_arc")
    for sub, n in (("training", n_train_tasks), ("evaluation", n_eval_tasks)):
        os.makedirs(os.path.join(arc, sub), exist_ok=True)
        for k in range(n):
            dump(make_task(rng), os.path.join(arc, sub, f"synth{k:03d}.json"))

    mini = os.path.join(root, "sample_miniarc")
    os.makedirs(mini, exist_ok=True)
    for k in range(n_mini):
        task = make_task(rng, min_size=5, max_size=5, n_train=2)
        dump(task, os.path.join(mini, f"sample task {k}_m{k:03d}.json"))
