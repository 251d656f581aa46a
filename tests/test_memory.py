"""HBM capacity-planner tests (engine/memory.py), calibrated against the
measured v5e facts: B=4 x 420 s fused whole-track fits, B=8 x 420 s
RESOURCE_EXHAUSTs."""

from umx_tpu.config import EngineConfig, SegmentConfig
from umx_tpu.engine.memory import (
    V5E_HBM_BYTES,
    fused_track_hbm_bytes,
    suggest_max_batch,
)


def _cfg(seg_secs=60.0):
    return EngineConfig(segment=SegmentConfig(segment_secs=seg_secs))


def test_monotonic_in_batch_and_length():
    cfg = _cfg()
    t = [fused_track_hbm_bytes(cfg, b, 420.0)["total"] for b in (1, 2, 4, 8)]
    assert t == sorted(t) and t[0] < t[-1]
    u = [fused_track_hbm_bytes(cfg, 2, s)["total"] for s in (60, 240, 420, 900)]
    assert u == sorted(u) and u[0] < u[-1]


def test_calibration_matches_measured_v5e_facts():
    cfg = _cfg()
    assert fused_track_hbm_bytes(cfg, 4, 420.0)["total"] <= V5E_HBM_BYTES
    assert fused_track_hbm_bytes(cfg, 8, 420.0)["total"] > V5E_HBM_BYTES


def test_suggest_max_batch():
    cfg = _cfg()
    b = suggest_max_batch(cfg, 420.0)
    assert b == 4
    assert suggest_max_batch(cfg, 60.0) > b  # shorter tracks batch wider
    # even an over-budget single track still returns 1
    assert suggest_max_batch(cfg, 10_000.0) == 1


def test_terms_present_and_positive():
    parts = fused_track_hbm_bytes(_cfg(), 2, 300.0)
    for k in ("ys", "ola", "stems", "audio", "seg_transients", "params", "total"):
        assert parts[k] > 0, k
    assert parts["total"] >= max(parts["scan_phase"], parts["ola_phase"])
