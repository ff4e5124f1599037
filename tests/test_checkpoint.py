"""Checkpoint/resume subsystem tests."""

import numpy as np

from hite_tpu.config import PipelineConfig
from hite_tpu.pipeline.checkpoint import Checkpointer, config_hash


def test_config_hash_stability_and_sensitivity():
    a = PipelineConfig()
    b = PipelineConfig()
    assert config_hash(a) == config_hash(b)
    c = PipelineConfig(plant=False)
    assert config_hash(a) != config_hash(c)


def test_checkpointer_roundtrip(tmp_path):
    cfg = PipelineConfig(recover=True)
    ck = Checkpointer(str(tmp_path), cfg)
    calls = []

    def compute():
        calls.append(1)
        return {"x": np.arange(5)}

    r1 = ck.run("stage1", compute)
    r2 = ck.run("stage1", compute)
    assert len(calls) == 1
    assert (r1["x"] == r2["x"]).all()

    # fresh Checkpointer, same dir/config -> still cached
    ck2 = Checkpointer(str(tmp_path), cfg)
    r3 = ck2.run("stage1", compute)
    assert len(calls) == 1
    assert (r3["x"] == r1["x"]).all()

    # config change invalidates
    ck3 = Checkpointer(str(tmp_path), cfg.replace(plant=False))
    ck3.run("stage1", compute)
    assert len(calls) == 2

    ck.clean()
    ck.run("stage1", compute)
    assert len(calls) == 3


def test_checkpointer_disabled(tmp_path):
    cfg = PipelineConfig(recover=False)
    ck = Checkpointer(str(tmp_path), cfg, enabled=cfg.recover)
    calls = []
    ck.run("s", lambda: calls.append(1))
    ck.run("s", lambda: calls.append(1))
    assert len(calls) == 2


def test_async_save_visible_to_next_load(tmp_path):
    from hite_tpu.config import PipelineConfig
    from hite_tpu.pipeline.checkpoint import Checkpointer

    cfg = PipelineConfig()
    ck = Checkpointer(str(tmp_path), cfg, enabled=True)
    big = {"x": list(range(100_000))}
    ck.save("stage_a", big)
    # load() must drain the in-flight background write
    assert ck.load("stage_a") == big
    ck2 = Checkpointer(str(tmp_path), cfg, enabled=True)
    assert ck2.load("stage_a") == big
