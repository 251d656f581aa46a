"""Observability utils tests."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest


def test_stage_timer_accumulates_and_reports():
    from umx_tpu.utils.profiling import StageTimer

    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    with t.stage("b", block_on=jnp.ones(4) * 2):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    rep = t.report()
    assert "a" in rep and "b" in rep and "mean_ms" in rep
    parsed = json.loads(t.as_json())
    assert parsed["a"]["calls"] == 2


@pytest.mark.slow
def test_device_trace_writes_profile(tmp_path):
    from umx_tpu.utils.profiling import device_trace

    log_dir = str(tmp_path / "trace")
    with device_trace(log_dir):
        _ = np.asarray(jnp.arange(16) * 2.0)
    # jax writes plugins/profile/<ts>/*.pb under the log dir
    found = []
    for root, _, files in os.walk(log_dir):
        found.extend(files)
    assert found, "no trace files written"


def test_leveled_logging(capsys, monkeypatch):
    from umx_tpu.utils import logging as ulog

    monkeypatch.setenv("UMX_TPU_LOG", "warn")
    ulog.info("hidden")
    ulog.warn("visible")
    err = capsys.readouterr().err
    assert "hidden" not in err
    assert "visible" in err

    monkeypatch.setenv("UMX_TPU_LOG", "debug")
    ulog.debug("dbg")
    assert "dbg" in capsys.readouterr().err
