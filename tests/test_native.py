"""Native C++ dataset baker: parity with the Python JSON path + speed."""

import json
import time

import numpy as np
import pytest

from arcle_tpu import native
from arcle_tpu.loaders import ARCLoader, MiniARCLoader, make_tasks


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_bake_matches_json():
    tasks = make_tasks(6, seed=11)
    for ti, to, ei, eo, _ in tasks:
        payload = {
            "train": [{"input": i.tolist(), "output": o.tolist()}
                      for i, o in zip(ti, to)],
            "test": [{"input": i.tolist(), "output": o.tolist()}
                     for i, o in zip(ei, eo)],
        }
        text = json.dumps(payload)
        train, test = native.bake_task_native(text)
        assert len(train) == len(ti) and len(test) == len(ei)
        for (gi, go), ri, ro in zip(train, ti, to):
            np.testing.assert_array_equal(gi, ri)
            np.testing.assert_array_equal(go, ro)
        for (gi, go), ri, ro in zip(test, ei, eo):
            np.testing.assert_array_equal(gi, ri)
            np.testing.assert_array_equal(go, ro)


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_bake_null_quirk():
    text = '{"train": [{"input": [[null, 1]], "output": [["0", 2]]}], "test": []}'
    train, test = native.bake_task_native(text)
    np.testing.assert_array_equal(train[0][0], [[0, 1]])
    np.testing.assert_array_equal(train[0][1], [[0, 2]])


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_native_bake_rejects_garbage():
    assert native.bake_task_native("not json at all") in (None, ([], []))


def test_loaders_still_parse_bundled():
    # loaders route through the native path when available
    a = ARCLoader()
    assert len(a.data) == 16
    m = MiniARCLoader()
    assert len(m.data) == 8
