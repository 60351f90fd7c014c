"""Aux subsystems: config, checkpointing, metrics, render."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from arcle_tpu.utils.config import RunConfig, EnvConfig, make_table, \
    make_loader
from arcle_tpu.utils.metrics import MetricLogger, Throughput
from arcle_tpu.utils.checkpoint import Checkpointer


def test_config_json_roundtrip():
    cfg = RunConfig(env=EnvConfig(family="raw"))
    js = json.loads(cfg.to_json())
    assert js["env"]["family"] == "raw"
    assert make_table(cfg.env).n_ops == 12
    assert len(make_loader(cfg.env).data) > 0


def test_metric_logger(tmp_path):
    path = str(tmp_path / "m.jsonl")
    lg = MetricLogger(path)
    lg.log(0, {"loss": jnp.asarray(1.5), "vec": jnp.asarray([1.0, 2.0])})
    row = json.loads(open(path).read().strip())
    assert row["loss"] == 1.5 and row["vec"] == [1.0, 2.0]
    t = Throughput()
    rate = t.tick(100, jnp.asarray(0.0))
    assert rate > 0


def test_checkpoint_roundtrip(tmp_path):
    ck = Checkpointer(str(tmp_path / "ck"))
    tree = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
            "step": jnp.asarray(3)}
    ck.save(0, tree)
    assert ck.latest_step() == 0
    template = jax.tree.map(np.zeros_like, tree)
    restored = ck.restore(template)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(tree["params"]["w"]))


def test_train_driver_smoke(tmp_path):
    """python -m arcle_tpu.training.train --smoke runs a PPO iteration."""
    from arcle_tpu.training.train import main
    main(["--smoke", "--algo", "ppo", "--iterations", "1",
          "--log-file", str(tmp_path / "log.jsonl"),
          "--ckpt-dir", str(tmp_path / "ck")])
    assert os.path.exists(tmp_path / "log.jsonl")


def test_train_gpt_driver_smoke(tmp_path):
    from arcle_tpu.training.train_gpt import main
    main(["--smoke", "--algo", "ppo", "--iterations", "1",
          "--log-file", str(tmp_path / "log.jsonl"),
          "--ckpt-dir", str(tmp_path / "ck")])
    assert os.path.exists(tmp_path / "log.jsonl")
