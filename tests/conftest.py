"""Test session bootstrap.

Two environment problems must be fixed *before the interpreter starts*,
which a conftest normally cannot do, so we re-exec pytest once with a
cleaned environment:

1. This container's ``PYTHONPATH`` injects a sitecustomize that registers
   the experimental axon TPU PJRT plugin in every Python process (and
   imports jax at startup).  With it registered, host transfers of jitted
   CPU results deadlock — and per-test env vars are too late to matter.
2. Sharding tests need ``--xla_force_host_platform_device_count=8``, which
   must be set before jax initializes.

``bench.py`` (not the tests) is the real-TPU entry point.
"""

import os
import sys

_GUARD = "ARCLE_TPU_TEST_REEXEC"


def _restore_captured_stdio() -> None:
    """Undo pytest's fd-level capture before execve.

    Global capture starts *before* initial conftests load, so a re-exec'd
    process would inherit fd1/fd2 pointing at pytest's (discarded) capture
    temp files and all test output would vanish.  pytest's FDCapture keeps
    the original fd in ``targetfd_save``; dup2 it back.
    """
    import gc

    for obj in gc.get_objects():
        if type(obj).__name__ in ("FDCapture", "FDCaptureBinary"):
            try:
                os.dup2(obj.targetfd_save, obj.targetfd)
            except Exception:
                pass


if os.environ.get(_GUARD) != "1":
    env = dict(os.environ)
    env[_GUARD] = "1"
    # Drop the axon sitecustomize dir; keep any other user path entries.
    parts = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
             if p and "axon_site" not in p]
    env["PYTHONPATH"] = os.pathsep.join(parts)
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    env["XLA_FLAGS"] = flags
    _restore_captured_stdio()
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest", *sys.argv[1:]], env)

import numpy as np
import pytest


def pytest_collection_modifyitems(config, items):
    """Two-tier suite: anything not marked ``slow`` is the quick gate.
    ``pytest -m quick`` validates a change in under ~2 minutes; the slow
    tier holds the compile-heavy engine/fuzz/driver/sharding tests."""
    for item in items:
        if item.get_closest_marker("slow") is None:
            item.add_marker(pytest.mark.quick)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
